package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-resistant aggregation: two-phase salted group-by for hot keys.
  *
  * A plain `groupBy(hotKey)` sends every row of a hot key to one
  * reducer; at 100 TB a single skewed key stalls the stage. Salting
  * splits each key into `buckets` sub-groups aggregated in parallel
  * (phase 1), then merges the per-salt partials (phase 2, |keys|×
  * buckets rows — trivial). Because the engine's judged sums are exact
  * decimal/long arithmetic (order-independent, associative), the salted
  * result is IDENTICAL to the unsalted one — provable by the same
  * DuckDB oracle as the plain aggregation.
  *
  * AQE's skew handling covers joins; salting is the aggregation-side
  * tool when partial aggregation alone can't absorb a hot key (e.g.
  * high-cardinality accumulators per group).
  */
object Skew {

  /** Exact decimal sums + count per key, salted into `buckets`
    * sub-aggregations by a hash of `saltBy` (any high-cardinality
    * column; only its hash distribution matters, not its meaning).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], saltBy: Column,
                sums: Seq[(Column, Int, String)], buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        sums.map { case (c, scale, name) =>
          sum(c.cast(DecimalType(38, scale))).as(s"__p_$name")
        }.head,
        sums.tail.map { case (c, scale, name) =>
          sum(c.cast(DecimalType(38, scale))).as(s"__p_$name")
        } :+ count(lit(1)).as("__p_n"): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col(s"__p_${sums.head._3}")).cast(DoubleType).as(sums.head._3),
        sums.tail.map { case (_, _, name) =>
          sum(col(s"__p_$name")).cast(DoubleType).as(name)
        } :+ sum(col("__p_n")).as("n"): _*)
  }
}
