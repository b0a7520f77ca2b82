package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Attribution

/** Shared machinery for the streaming-attribution queries (c32/c33):
  * the events table becomes a deterministic file feed — 3 ts-range
  * chunks with pinned ascending mtimes (house discipline from c31) —
  * optionally followed by watermark-bearing SENTINEL files (single
  * `user_id = -1` rows far past the data range). Sentinels model the
  * heartbeat a production pipeline always has (event time never stops
  * at 100 TB): they advance the watermark past the data so
  * EventTimeTimeout state eviction fires deterministically, and the
  * final drain enumerates surviving state — making the state-store
  * SIZE part of the judged output instead of an assertion.
  */
object EventFeed {
  /** Schema of the feed files = [[Attribution.EvW]]: `ts` carries the
    * event-time watermark, `ts_us` the same instant as a long for
    * exact integer arithmetic.
    */
  val schema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("k", LongType),
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("ts_us", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Build the feed, stream it through
    * [[Attribution.attributeWindowed]], and roll up the emitted rows.
    *
    * @param perCampaign entity = (user, props.k) when true, else
    *                    (user) with k pinned to 0
    * @param windowOf    attribution window in µs from (loUs, hiUs)
    * @param sentinelGaps for each gap g, one sentinel file at
    *                    ts = hi + g·window (empty = no eviction audit)
    */
  def windowedAttributionRollup(s: SparkSession, dir: String,
      tmpPrefix: String, perCampaign: Boolean,
      windowOf: (Long, Long) => Long,
      sentinelGaps: Seq[Long]): DataFrame = {
    import s.implicits._
    val kCol =
      if (perCampaign) get_json_object(col("props"), "$.k").cast("long")
      else lit(0L)
    val ev = Tables.events(s, dir).select(col("user_id"),
      kCol.as("k"), col("event_id"), col("ts"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
    val tmp = Stage.tempDir(tmpPrefix).toString
    val feed = s"$tmp/feed"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val bounds = ev.agg(min("ts_us"), max("ts_us")).head()
    val (lo0, hi0) = (bounds.getLong(0), bounds.getLong(1))
    val w = windowOf(lo0, hi0)
    val step = (hi0 - lo0) / 3 + 1
    val feedDir = new java.io.File(feed)
    val stamped = scala.collection.mutable.Set[String]()
    var fileIdx = 0
    def pinNew(): Unit = feedDir.listFiles().foreach { f =>
      val n = f.getName
      if (!n.startsWith("_") && !n.startsWith(".") &&
          !stamped.contains(n)) {
        require(f.setLastModified(1700000000000L + fileIdx * 600000L),
          s"mtime pin failed for $f — arrival order would race")
        stamped += n
      }
    }
    var lo = Long.MinValue
    Seq(lo0 + step, lo0 + 2 * step, Long.MaxValue).foreach { hi =>
      ev.where(col("ts_us") > lo && col("ts_us") <= hi)
        .coalesce(1).write.mode("append").parquet(feed)
      pinNew(); fileIdx += 1; lo = hi
    }
    sentinelGaps.foreach { g =>
      val ts = hi0 + g * w
      s.range(1).select(lit(-1L).as("user_id"), lit(0L).as("k"),
          lit(-1L).as("event_id"), timestamp_micros(lit(ts)).as("ts"),
          lit(ts).as("ts_us"), lit("noop").as("event_type"),
          lit(0.0).as("value"))
        .coalesce(1).write.mode("append").parquet(feed)
      pinNew(); fileIdx += 1
    }
    val prev = s.conf.get("spark.sql.shuffle.partitions", "32")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val in = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(feed)
        .withWatermark("ts", "0 seconds")
        .as[Attribution.EvW]
      Attribution.attributeWindowed(in, w, drainAfterMs = hi0 / 1000L)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            Attribution.Attributed], _: Long) =>
          batch.write.mode("append").parquet(out); ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow)
        .start().awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    s.read.parquet(out)
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("conversions"),
        Tables.dsum(col("value"), 2).as("attributed_value"))
  }
}
