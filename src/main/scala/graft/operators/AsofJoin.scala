package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach values from the latest right
  * row with `rightTs <= leftTs` in the same key group — the canonical
  * time-series enrichment operator (quote-at-trade, last-state-at-event).
  *
  * Spark has no native as-of join; the scalable shape used here is
  * union-then-window: tag both sides, sort each key group once by
  * (ts, side, tiebreak), and carry right-side values forward with
  * `last(ignoreNulls)` over an unbounded-preceding frame. Cost = one
  * hash exchange on the key + one sort per partition — no range cross
  * join, no per-row probing, state O(1) per group during the scan. At
  * 100 TB this is exactly a sort-merge join's cost profile and
  * parallelizes by key like any window.
  *
  * Tie semantics: a right row at exactly leftTs IS visible (<=); among
  * multiple right rows with equal (key, ts) the greatest `tiebreak`
  * wins — deterministic by construction.
  *
  * `tolerance` bounds staleness (pandas `merge_asof(tolerance=...)`):
  * when set, a carried value older than `leftTs - tolerance` is nulled
  * — the matched row's own timestamp is carried alongside the values,
  * so the bound costs one extra window column, not a second join.
  *
  * `direction`: "backward" (default — latest right row at or before
  * leftTs) or "forward" (earliest right row at or after leftTs); the
  * forward form is the same union-then-window plan with the timestamp
  * sort flipped, and its tolerance bound flips to `leftTs + tolerance`.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightVals: Seq[(String, String)],
               tiebreak: Column,
               tolerance: Option[Column] = None,
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val fwd = direction == "forward"
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
    val rTagged = rightVals
      .foldLeft(right) { case (df, (src, dst)) => df.withColumnRenamed(src, s"__rv_$dst") }
      .select((keys.map(col) :+ col(rightTs).as("__ts") :+
        lit(0).as("__side") :+ tiebreak.cast("long").as("__tie")) ++
        rightVals.map { case (_, dst) => col(s"__rv_$dst") }: _*)
      // carry the right row's own timestamp with its values so a
      // staleness bound can be applied after the fill
      .withColumn("__rv___rts", col("__ts"))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal ts (__side 0 < 1), and
    // among equal right timestamps the greatest tiebreak sorts last →
    // last(ignoreNulls) picks it
    // forward direction: scan timestamps descending so rows "earlier in
    // the sort" are those at-or-after the left row; the last non-null
    // before the current row is then the EARLIEST such right row
    val tsOrder = if (fwd) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.map { case (_, dst) => dst } :+ "__rts"
    val filled = carried.foldLeft(unioned) { (df, dst) =>
      df.withColumn(dst, last(col(s"__rv_$dst"), ignoreNulls = true).over(w))
    }
    val base = filled.where(col("__side") === 1)
    val bounded = tolerance match {
      case Some(tol) => rightVals.foldLeft(base) { case (df, (_, dst)) =>
        val inBound = if (fwd) col("__rts") <= col("__ts") + tol
          else col("__rts") >= col("__ts") - tol
        df.withColumn(dst, when(inBound, col(dst)))
      }
      case None => base
    }
    bounded
      .select(leftCols.map(col) ++ rightVals.map { case (_, dst) => col(dst) }: _*)
  }
}
