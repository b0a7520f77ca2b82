package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.sinks.Sinks

/** K1's LIVE form executed for real: [[Sinks.appendJdbc]] against
  * embedded Derby (on the Spark classpath for the Hive metastore), so
  * the JDBC write path — connection-per-partition, batched inserts,
  * append accumulation — is driven by the actual engine rather than
  * annotated as untestable. The reference's sink knobs
  * (cassandra-sink-config.json:10-12) map to `batchsize` /
  * `numPartitions` / `queryTimeout`, all exercised here.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("appendJdbc lands rows; a second append accumulates (blind append)") {
    val batch1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    val batch2 = Seq((2L, "b2", 21.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    Sinks.appendJdbc(batch1, url, "t_append", batchSize = 2,
      maxConnections = 2)
    Sinks.appendJdbc(batch2, url, "t_append", batchSize = 32)
    val back = spark.read.jdbc(url, "t_append", new java.util.Properties())
    assert(back.count() === 4)
    // blind append: key 2 present twice (upsert is the READ path's job,
    // exactly like the reference's Cassandra SSTable-append semantics)
    assert(back.where(col("id") === 2).count() === 2)
    val state = Sinks.upsertLastWins(back, Seq("id"), Seq("v"))
    assert(state.count() === 3)
    assert(state.where(col("id") === 2).select("name").as[String].head()
      === "b2")
  }

  test("streaming leg: foreachBatch appends micro-batches to JDBC") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jdbc-").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "s")
      .write.mode("append").parquet(s"$tmp/feed")
    Seq((3L, "z")).toDF("id", "s")
      .write.mode("append").parquet(s"$tmp/feed")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType)))
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/feed")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sinks.appendJdbc(batch, url, "t_stream", batchSize = 32); ()
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow).start().awaitTermination()
    val back = spark.read.jdbc(url, "t_stream", new java.util.Properties())
    assert(back.as[(Long, String)].collect().toSet
      === Set((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("predicate pushdown reaches the JDBC read side") {
    val back = spark.read.jdbc(url, "t_append", new java.util.Properties())
      .where(col("id") === 1)
    // the filter must reach the remote scan (at scale: the DB does the
    // filtering, Spark never transfers the table)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,1)"))
    assert(back.count() === 1)
  }
}
