package graft

import org.apache.spark.sql.Row
import graft.sources.FixtureSource
import graft.transforms.Transforms
import graft.schemas.Catalog
import org.apache.spark.sql.types._

/** Golden-payload tests for the five transforms (FIXTURES.md §B.2):
  * the same payload shapes the reference consumes (etl.py:114-179).
  */
class TransformsSpec extends SparkSpec {

  private val priceSchema = StructType(Seq(
    StructField("symbol", StringType), StructField("price", StringType)))

  test("latest_prices: object payload normalizes and casts (P1,P3,P8)") {
    val parsed = FixtureSource.parse(spark,
      """{"symbol": "BTCUSDT", "price": "67000.12345678"}""", priceSchema)
    val out = Transforms.latestPrices(parsed).collect()
    assert(out.toSeq === Seq(Row("BTCUSDT", 67000.12345678)))
  }

  test("latest_prices: array payload gives one row per element (P8)") {
    val parsed = FixtureSource.parse(spark,
      """[{"symbol":"A","price":"1.5"},{"symbol":"B","price":"2.5"}]""",
      priceSchema)
    assert(Transforms.latestPrices(parsed).collect().toSeq ===
      Seq(Row("A", 1.5), Row("B", 2.5)))
  }

  test("latest_prices: garbage price casts to null, then suppressible (P3,P10)") {
    val parsed = FixtureSource.parse(spark,
      """[{"symbol":"A","price":"oops"},{"symbol":"B","price":"2"}]""",
      priceSchema)
    val out = Transforms.latestPrices(parsed)
    assert(out.collect().toSeq === Seq(Row("A", null), Row("B", 2.0)))
    assert(Transforms.suppressNulls(out, Seq("price")).collect().toSeq ===
      Seq(Row("B", 2.0)))
  }

  private val bookSchema = StructType(Seq(
    StructField("bids", ArrayType(ArrayType(StringType))),
    StructField("asks", ArrayType(ArrayType(StringType)))))

  test("order_book: positional zip of bids/asks, top-5 (P4,P5,P6)") {
    val levels = (1 to 7).map(i => s"""["${i}00.5","0.$i"]""").mkString(",")
    val parsed = FixtureSource.parse(spark,
      s"""{"bids":[$levels],"asks":[$levels]}""", bookSchema)
    val out = Transforms.orderBook(parsed, "BTCUSDT").collect()
    assert(out.length === 5)
    assert(out.head === Row("BTCUSDT", 100.5, 0.1, 100.5, 0.1))
    assert(out.last === Row("BTCUSDT", 500.5, 0.5, 500.5, 0.5))
  }

  test("order_book: missing bids key → empty default → zero rows (P9)") {
    val parsed = FixtureSource.parse(spark,
      """{"asks":[["1.0","2.0"]]}""", bookSchema)
    // null-padded zip leaves bid side null; reference semantics (empty
    // frame) are recovered by suppressing rows missing a required side
    val out = Transforms.suppressNulls(
      Transforms.orderBook(parsed, "X"), Seq("bid_price"))
    assert(out.count() === 0)
  }

  test("order_book: ragged arrays null-pad instead of failing (P6,P9)") {
    val parsed = FixtureSource.parse(spark,
      """{"bids":[["1.0","2.0"],["3.0","4.0"]],"asks":[["5.0","6.0"]]}""",
      bookSchema)
    val out = Transforms.orderBook(parsed, "X").collect()
    assert(out.toSeq === Seq(
      Row("X", 1.0, 2.0, 5.0, 6.0),
      Row("X", 3.0, 4.0, null, null)))
  }

  private val tradeSchema = StructType(Seq(
    StructField("price", StringType), StructField("qty", StringType),
    StructField("time", LongType), StructField("isBuyerMaker", BooleanType),
    StructField("extra", StringType)))

  test("recent_trades: project/rename/cast/limit, extras dropped (P1,P2,P3,P5)") {
    val recs = (1 to 60).map(i =>
      s"""{"price":"$i.5","qty":"0.$i","time":${i}000,"isBuyerMaker":${i % 2 == 0},"extra":"x"}""")
    val parsed = FixtureSource.parse(spark, recs.mkString("[", ",", "]"),
      tradeSchema)
    val out = Transforms.recentTrades(parsed, "BTCUSDT", 50)
    assert(out.count() === 50)
    assert(out.columns.toSeq === Seq("symbol", "price", "quantity",
      "trade_time", "is_buyer_maker"))
    assert(out.collect().head === Row("BTCUSDT", 1.5, 0.1, 1000L, false))
  }

  test("klines: positional 12-tuple heterogeneous array → named columns (P7)") {
    val payload =
      """[[1704067200000, "42000.1", "42100.2", "41900.3", "42050.4",
          "123.456", 1704070799999, "5187000.0", 1500, "60.1", "2525000.0", "0"]]"""
    val parsed = FixtureSource.parsePositional(spark, payload)
    val out = Transforms.klines(parsed, "BTCUSDT").collect()
    assert(out.toSeq === Seq(Row("BTCUSDT", 1704067200000L, 42000.1, 42100.2,
      41900.3, 42050.4, 123.456, 1704070799999L)))
  }

  test("ticker_24hr: camelCase→snake_case renames and casts (P1,P2,P3)") {
    val schema = StructType(Seq("symbol", "priceChange", "priceChangePercent",
      "weightedAvgPrice", "prevClosePrice", "lastPrice", "volume")
      .map(StructField(_, StringType)))
    val parsed = FixtureSource.parse(spark,
      """{"symbol":"BTCUSDT","priceChange":"-94.99","priceChangePercent":"-0.141",
         "weightedAvgPrice":"67100.5","prevClosePrice":"67300.1",
         "lastPrice":"67205.11","volume":"36000.0"}""", schema)
    val out = Transforms.ticker24hr(parsed).collect()
    assert(out.toSeq === Seq(Row("BTCUSDT", -94.99, -0.141, 67100.5,
      67300.1, 67205.11, 36000.0)))
  }

  test("replay tags each captured poll and applies the per-poll limit (S1,P5)") {
    val payloads = Seq(
      """[{"symbol":"A","price":"1"},{"symbol":"B","price":"2"}]""",
      """[{"symbol":"C","price":"3"}]""")
    val out = FixtureSource.replay(spark, payloads, priceSchema)
      .orderBy("poll", "symbol").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((0, "A"), (0, "B"), (1, "C")))
    assert(FixtureSource.replay(spark, payloads, priceSchema,
      limitPerPoll = Some(2)).count() === 2)
  }

  test("declared catalog matches the five-table DDL shape (K3)") {
    assert(Catalog.tableNames.toSet === Catalog.tables.keySet)
    assert(Catalog.tables("klines").fieldNames.toSeq === Seq("id", "symbol",
      "open_time", "open_price", "high_price", "low_price", "close_price",
      "volume", "close_time", "timestamp"))
    assert(Catalog.ddlRows.size === Catalog.tables.values.map(_.size).sum)
  }
}
