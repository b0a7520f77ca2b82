package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Storage-layout levers for 100 TB (SCALE.md): bucketed tables
  * co-locate join keys so repeated joins skip the shuffle entirely, and
  * partitioned writes let filters prune whole directories. These tests
  * assert the *physical plans*, not just results.
  */
class StorageLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("a"))
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bkt_left")
      spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("b"))
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bkt_right")
      val joined = spark.table("bkt_left")
        .join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("partitioned writes prune partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    Seq(("click", 1L), ("view", 2L), ("click", 3L), ("purchase", 4L))
      .toDF("event_type", "v")
      .write.partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).where(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type"), s"expected partition pruning:\n$scan")
    assert(q.count() === 2)
    // only the matching partition directory is listed as input
    val inputs = q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.filter(_.contains("Location")))
    assert(inputs.nonEmpty)
  }
}
