package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unit coverage for the round-8 second-wave batch shapes on
  * handcrafted frames — the judged queries prove engine parity on
  * testdata; these pin the operator LOGIC on inputs small enough to
  * check by hand (quantile index arithmetic, LOCF fill, RANGE frame
  * time edges).
  */
class Surface12Spec extends SparkSpec {
  import spark.implicits._

  test("winsorize bound indices use exact integer ceil arithmetic") {
    // n = 10 → k10 = ceil(10/10) = 1 (the minimum), k90 = ceil(90/10) = 9
    val d = (1 to 10).map(i => ("g", i.toLong, i * 100L))
      .toDF("g", "doc_id", "v")
    val r = d.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v"), col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
    val bounds = r.groupBy("g").agg(
      max(when(col("rn") === expr("(n + 9) div 10"), col("v"))).as("lo"),
      max(when(col("rn") === expr("(9 * n + 9) div 10"), col("v"))).as("hi"))
      .as[(String, Long, Long)].collect().head
    assert(bounds == (("g", 100L, 900L)))
  }

  test("range frame on epoch seconds includes ties and excludes t-3601") {
    val rows = Seq((1L, 0L, 1L), (2L, 3600L, 10L), (3L, 3600L, 100L),
      (4L, 7201L, 1000L)).toDF("id", "sec", "vm")
    val w = Window.partitionBy(lit(1)).orderBy(col("sec"))
      .rangeBetween(-3600, Window.currentRow)
    val got = rows.select(col("id"), sum("vm").over(w).as("s"))
      .as[(Long, Long)].collect().toMap
    // rows 2 and 3 tie at 3600: both frames span [0, 3600] → 111
    assert(got(2L) == 111L && got(3L) == 111L)
    // row 4 at 7201: frame [3601, 7201] excludes the tie at 3600
    assert(got(4L) == 1000L)
    assert(got(1L) == 1L)
  }

  test("LOCF forward fill carries the last observed value, not beyond") {
    val obs = Seq((1L, 0L, Some(5L)), (1L, 1L, None), (1L, 2L, None),
      (1L, 3L, Some(7L)), (1L, 4L, None)).toDF("u", "hr", "s")
    val w = Window.partitionBy("u").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = obs.select(col("hr"),
      last(col("s"), ignoreNulls = true).over(w).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(filled == Map(0L -> 5L, 1L -> 5L, 2L -> 5L, 3L -> 7L, 4L -> 7L))
  }

  test("blocklist match is deduped, sorted, and keeps clean docs") {
    val docs = Seq((1L, "spark and spark stream"), (2L, "nothing here"))
      .toDF("doc_id", "text")
    val terms = Seq("spark", "stream", "vector")
    val got = docs.select(col("doc_id"),
      array_sort(array_intersect(
        array_distinct(graft.operators.TextAnalysis.tokens(col("text"))),
        lit(terms.toArray))).as("m"))
      .select(col("doc_id"), concat_ws(",", col("m")).as("matched"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "spark,stream")
    assert(got(2L) == "")
  }
}
