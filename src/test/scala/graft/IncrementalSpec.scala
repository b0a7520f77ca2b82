package graft

import org.apache.spark.sql.functions._
import graft.operators.Incremental

/** Incremental aggregate maintenance: folding delta states must be
  * exactly a full recompute, regardless of how the data was sliced into
  * deltas or the order the states are merged.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1.25), ("a", 2.50), ("a", 3.75), ("b", 10.00), ("b", 0.01),
    ("c", 7.77)).toDF("k", "v")

  private def img(d: org.apache.spark.sql.DataFrame) =
    d.orderBy("k").collect().toSeq

  test("merge of sliced states equals the full recompute") {
    val full = Incremental.finalizeState(
      Incremental.aggState(df, Seq("k"), "v", 2), Seq("k"))
    val slices = Seq(
      df.where(col("v") < 3), df.where(col("v") >= 3 && col("v") < 8),
      df.where(col("v") >= 8))
      .map(Incremental.aggState(_, Seq("k"), "v", 2))
    val merged = Incremental.finalizeState(
      Incremental.mergeStates(slices, Seq("k")), Seq("k"))
    assert(img(merged) === img(full))
  }

  test("merge order never changes the state (monoid associativity)") {
    val s1 = Incremental.aggState(df.where(col("v") < 3), Seq("k"), "v", 2)
    val s2 = Incremental.aggState(df.where(col("v") >= 3), Seq("k"), "v", 2)
    val ab = Incremental.mergeStates(Seq(s1, s2), Seq("k"))
    val ba = Incremental.mergeStates(Seq(s2, s1), Seq("k"))
    assert(img(ab) === img(ba))
  }

  test("keys absent from the delta pass through the merge unchanged") {
    val base = Incremental.aggState(df, Seq("k"), "v", 2)
    val delta = Incremental.aggState(
      Seq(("a", 1.00)).toDF("k", "v"), Seq("k"), "v", 2)
    val merged = Incremental.finalizeState(
      Incremental.mergeStates(Seq(base, delta), Seq("k")), Seq("k"))
    val untouched = merged.where(col("k") === "b")
      .select("n", "total").collect()
    assert(untouched.head.getLong(0) === 2L)
    assert(untouched.head.getDouble(1) === 10.01)
  }
}
