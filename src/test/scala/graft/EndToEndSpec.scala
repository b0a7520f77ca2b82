package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Ingest
import graft.transforms.Transforms

/** The reference pipeline end-to-end in Spark: captured poll payloads →
  * DSv2 poll source → parse → transform → id/timestamp stamping →
  * append sink (reference: etl.py:189-240 whole main loop).
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private val priceSchema = StructType(Seq(
    StructField("symbol", StringType), StructField("price", StringType)))

  test("poll → parse → transform → serial id + timestamp → append sink") {
    val polls = Files.createTempDirectory("graft-e2e-polls").toString
    Files.writeString(Paths.get(polls, "p0.json"),
      """[{"symbol":"BTCUSDT","price":"100.5"},{"symbol":"ETHUSDT","price":"55.25"}]""")
    Files.writeString(Paths.get(polls, "p1.json"),
      """{"symbol":"BTCUSDT","price":"101.25"}""")
    val sink = Files.createTempDirectory("graft-e2e-sink").toString + "/latest_prices"

    // batch replay of the captured polls through the DSv2 source
    val raw = spark.read.format("graft.sources.PollSourceProvider")
      .option("path", polls).load()
    val parsed = raw.select(col("poll"),
        explode(from_json(col("value"), ArrayType(priceSchema))).as("r"))
      .select(col("poll"), col("r.symbol").as("symbol"),
        col("r.price").as("price"))
    val transformed = Transforms.latestPrices(parsed)

    val clock = lit("2024-01-01 00:00:00").cast("timestamp")
    Ingest.ingestBatch(transformed,
      idOrder = Seq(col("symbol"), col("price")), sinkPath = sink,
      clock = clock)

    val out = spark.read.parquet(sink).orderBy("id")
      .select("id", "symbol", "price", "timestamp").collect()
    assert(out.toSeq === Seq(
      Row(1, "BTCUSDT", 100.5, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      Row(2, "BTCUSDT", 101.25, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      Row(3, "ETHUSDT", 55.25, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))))
    // the sink rows carry exactly the declared latest_prices columns
    val declared = graft.schemas.Catalog.latestPrices.fieldNames.toSet
    assert(spark.read.parquet(sink).columns.toSet === declared)
    // the scale-path id variant is unique (not contiguous)
    val ids = Ingest.withSerialIdAtScale(transformed)
      .select("id").as[Long].collect()
    assert(ids.distinct.length === ids.length)
  }
}
