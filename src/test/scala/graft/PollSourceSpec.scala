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
