package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking (north star §2.5: total-order analytics —
  * row_number / ntile / cume_dist over one global ordering).
  *
  * `Window.orderBy(...)` with no partition key moves every row into a
  * single task — correct at test scale, serial-and-OOM at 100 TB. The
  * two-pass form here keeps the exact semantics with a fully parallel
  * plan:
  *
  *  1. range-partition on the sort key (Spark samples split points; the
  *     boundaries affect only load balance, never the ranks);
  *  2. count rows per partition — a `partitions`-sized frame collected
  *     to the driver (the same tiny collect `zipWithIndex` does) and
  *     prefix-summed into each partition's starting offset;
  *  3. a window keyed by partition id ranks locally; global rank =
  *     offset + local rank. ntile/cume_dist derive from the rank and
  *     the total count in closed form.
  *
  * Requires a total order (a unique sort key): ranks are then unique and
  * deterministic at any parallelism. Range partitioning keeps equal keys
  * together, so even with ties no rank span straddles a boundary.
  */
object Rank {

  /** `df` plus `<rnName>` = 1-based global row_number over `orderCols`
    * and `<totalName>` = total row count (for deriving ntile /
    * cume_dist / percent_rank without a second pass).
    */
  def withGlobalRowNumber(df: DataFrame, orderCols: Seq[Column],
                          rnName: String = "rn",
                          totalName: String = "n_total",
                          numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // pin partition assignment: pid feeds both the count job and the
    // ranking job, and repartitionByRange may resample boundaries on
    // re-evaluation
    val ranged = df.repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pn"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _)
    val offsetOf = counts.map(_._1).zip(offsets).toMap
    val offCol = counts.foldLeft(lit(0L)) { case (acc, (pid, _)) =>
      when(col("__pid") === pid, lit(offsetOf(pid))).otherwise(acc)
    }
    val wLocal = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    ranged
      .withColumn(rnName, offCol + row_number().over(wLocal))
      .withColumn(totalName, lit(total))
      .drop("__pid")
  }

  /** SQL ntile(k) from a 1-based global rank and the total count: the
    * first (n mod k) tiles take ceil(n/k) rows, the rest floor(n/k).
    */
  def ntileOf(rn: Column, total: Column, k: Int): Column = {
    val q = floor(total / lit(k.toDouble)).cast("long")
    val r = pmod(total, lit(k.toLong))
    val bigSpan = r * (q + lit(1L))
    when(rn <= bigSpan,
      ceil(rn / (q + lit(1L)).cast("double")).cast("long"))
      .otherwise(r + ceil((rn - bigSpan) / q.cast("double")).cast("long"))
  }

  /** cume_dist for a UNIQUE sort key: rank / n (with ties the frame
    * would extend to the last peer; unique keys have no peers).
    */
  def cumeDistOf(rn: Column, total: Column): Column =
    rn.cast("double") / total.cast("double")
}
