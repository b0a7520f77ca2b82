package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, Skew}

/** As-of join and skew-salted aggregation semantics. */
class AsofSkewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches latest right value at or before left ts, per key") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:20")),
      (3L, "B", ts("2024-01-01 10:00:10")),
      (4L, "A", ts("2024-01-01 09:59:00"))) // before any quote
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0, 10L),
      ("A", ts("2024-01-01 10:00:20"), 101.0, 11L), // exactly at trade 2 → visible
      ("B", ts("2024-01-01 10:00:01"), 50.0, 12L))
      .toDF("sym", "t", "px", "qid")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t",
      Seq("px" -> "last_px"), tiebreak = col("qid"))
      .orderBy("trade_id").collect()
    assert(out.toSeq === Seq(
      Row(1L, "A", ts("2024-01-01 10:00:05"), 100.0),
      Row(2L, "A", ts("2024-01-01 10:00:20"), 101.0),
      Row(3L, "B", ts("2024-01-01 10:00:10"), 50.0),
      Row(4L, "A", ts("2024-01-01 09:59:00"), null)))
  }

  test("asofJoin resolves equal-timestamp right rows by greatest tiebreak") {
    val left = Seq((1L, "A", ts("2024-01-01 10:00:10"))).toDF("id", "k", "t")
    val right = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0, 1L),
      ("A", ts("2024-01-01 10:00:00"), 2.0, 2L)) // same ts, higher tiebreak wins
      .toDF("k", "t", "v", "rid")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("v" -> "last_v"), tiebreak = col("rid")).collect()
    assert(out.head.getDouble(3) === 2.0)
  }

  test("salted aggregation equals the plain group-by exactly") {
    val df = spark.range(10000).select(
      (col("id") % 3).cast("string").as("k"),
      col("id").as("salt_src"),
      (col("id") % 97 / 100.0 * 100).as("v")) // 2-decimal-ish doubles
    val salted = Skew.saltedSum(df, Seq("k"), col("salt_src"),
      Seq((col("v"), 2, "sum_v")), buckets = 8)
      .orderBy("k").collect()
    val plain = df.groupBy("k")
      .agg(org.apache.spark.sql.functions.sum(
        col("v").cast(org.apache.spark.sql.types.DecimalType(38, 2)))
        .cast("double").as("sum_v"),
        count(lit(1)).as("n"))
      .orderBy("k").collect()
    assert(salted.toSeq === plain.toSeq)
  }
}
