package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.transforms.Transforms

/** DSv2 poll-source tests (S1): fixture files replayed as micro-batches,
  * then parsed/transformed by the same engine chain as live polls.
  */
class PollSourceSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDir(): String = {
    val dir = Files.createTempDirectory("graft-poll")
    Files.writeString(Paths.get(dir.toString, "poll_000.json"),
      """{"symbol": "BTCUSDT", "price": "100.5"}""")
    Files.writeString(Paths.get(dir.toString, "poll_001.json"),
      """{"symbol": "BTCUSDT", "price": "101.5"}""")
    Files.writeString(Paths.get(dir.toString, "poll_002.json"),
      """{"symbol": "ETHUSDT", "price": "55.25"}""")
    dir.toString
  }

  private val priceSchema = StructType(Seq(
    StructField("symbol", StringType), StructField("price", StringType)))

  test("batch read: one row per captured poll, in order") {
    val out = spark.read.format("graft.sources.PollSourceProvider")
      .option("path", fixtureDir()).load()
      .orderBy("poll").collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    assert(out.head.getString(1).contains("100.5"))
  }

  test("micro-batch stream: polls arrive through the checkpointed source (S1,C5)") {
    val dir = fixtureDir()
    val stream = spark.readStream
      .format("graft.sources.PollSourceProvider")
      .option("path", dir).load()
      .select(col("poll"),
        from_json(col("value"), priceSchema).as("r"))
      .select(col("poll"), col("r.symbol").as("symbol"),
        col("r.price").try_cast("double").as("price"))
    val q = stream.writeStream.format("memory").queryName("polls")
      .outputMode("append").start()
    q.processAllAvailable()
    // a new poll lands mid-stream → next micro-batch picks it up
    Files.writeString(Paths.get(dir, "poll_003.json"),
      """{"symbol": "ETHUSDT", "price": "56.0"}""")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("polls").orderBy("poll")
      .as[(Long, String, Double)].collect()
    assert(out.toSeq === Seq((0L, "BTCUSDT", 100.5), (1L, "BTCUSDT", 101.5),
      (2L, "ETHUSDT", 55.25), (3L, "ETHUSDT", 56.0)))
  }

  test("live HTTP mode: GET + query params + error-skip cycles (S1, etl.py:102-113)") {
    import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
    val served = new AtomicInteger(0)
    val failing = new AtomicBoolean(false)
    @volatile var lastQuery: String = null
    // in-process localhost server standing in for the reference's REST
    // endpoint (etl.py:102-113) — zero egress, real HTTP
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v3/ticker/price",
      (exchange: com.sun.net.httpserver.HttpExchange) => {
        lastQuery = exchange.getRequestURI.getQuery
        if (failing.get()) {
          exchange.sendResponseHeaders(500, -1); exchange.close()
        } else {
          val n = served.getAndIncrement()
          val sym = lastQuery.split("=")(1)
          val body =
            s"""{"symbol": "$sym", "price": "${100 + n}.5"}"""
              .getBytes("UTF-8")
          exchange.sendResponseHeaders(200, body.length.toLong)
          exchange.getResponseBody.write(body)
          exchange.close()
        }
      })
    server.start()
    try {
      val base = Files.createTempDirectory("graft-live")
      val (spool, ckpt, out) = (s"$base/spool", s"$base/ckpt", s"$base/out")
      val url = "http://127.0.0.1:" + server.getAddress.getPort +
        "/api/v3/ticker/price"
      // one AvailableNow run = one 60 s poll cycle of the reference loop
      def cycle(): Unit = {
        val q = spark.readStream
          .format("graft.sources.PollSourceProvider")
          .option("url", url).option("params", "symbol=BTCUSDT")
          .option("spool", spool).load()
          .select(col("poll"),
            from_json(col("value"), priceSchema).as("r"))
          .select(col("poll"), col("r.symbol").as("symbol"),
            col("r.price").try_cast("double").as("price"))
          .writeStream
          .foreachBatch {
            (b: org.apache.spark.sql.DataFrame, _: Long) =>
              b.write.mode("append").parquet(out); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      def rows() =
        try spark.read.parquet(out).as[(Long, String, Double)]
          .collect().toSeq.sorted
        catch { case _: Exception => Seq.empty } // no batch yet
      cycle() // healthy: one GET lands poll 0
      assert(lastQuery === "symbol=BTCUSDT") // params reached the wire
      assert(rows() === Seq((0L, "BTCUSDT", 100.5)))
      failing.set(true)
      cycle() // fetch fails → cycle SKIPPED, stream healthy, no rows
      assert(rows() === Seq((0L, "BTCUSDT", 100.5)))
      failing.set(false)
      cycle() // recovered: next poll lands with the next offset
      assert(rows() === Seq((0L, "BTCUSDT", 100.5),
        (1L, "BTCUSDT", 101.5)))
      // live-mode BATCH read: pure replay of the spool (acquisition is
      // the stream trigger's job — a batch scan can be planned more
      // than once and must stay side-effect-free)
      val batch = spark.read.format("graft.sources.PollSourceProvider")
        .option("url", url).option("params", "symbol=BTCUSDT")
        .option("spool", spool).load().orderBy("poll").collect()
      assert(batch.map(_.getLong(0)).toSeq === Seq(0L, 1L))
      assert(served.get() === 2) // exactly one GET per healthy cycle
    } finally server.stop(0)
  }

  test("poll source feeds the latest_prices transform chain end-to-end (S1,P1,P3)") {
    val parsed = spark.read.format("graft.sources.PollSourceProvider")
      .option("path", fixtureDir()).load()
      .select(from_json(col("value"), priceSchema).as("r"))
      .select(col("r.symbol").as("symbol"), col("r.price").as("price"))
    val out = Transforms.latestPrices(parsed).orderBy("price").collect()
    assert(out.toSeq === Seq(Row("ETHUSDT", 55.25), Row("BTCUSDT", 100.5),
      Row("BTCUSDT", 101.5)))
  }
}
