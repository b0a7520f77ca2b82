package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline operator, Börzsönyi et al. 2001) of a
  * VALUE set under (minimize x, maximize y), with point
  * multiplicities — the multi-criteria selection no single ORDER BY
  * answers ("the shortest document at every richness level").
  *
  * Scale shape (100 TB): the frontier is computed on the x-DOMAIN
  * histogram (one hash aggregate from the rows; |distinct x| rows,
  * bounded by the attribute's domain, never by the corpus), and the
  * strict-dominance test is a prefix-max triangle over that
  * domain-bounded frame — the calendar-triangle pattern (q123/q126)
  * applied to an attribute domain. Judged as `e169_skyline`.
  */
object Skyline {

  /** Frontier points (x, best_y, n_docs) of `df` under
    * (minimize xCol, maximize yCol): for each x value the best y and
    * its multiplicity, filtered to points no smaller-x value matches
    * or beats.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val byPoint = df.groupBy(xCol, yCol)
      .agg(count(lit(1)).as("n_docs"))
    val h = byPoint
      .groupBy(xCol)
      .agg(max(struct(col(yCol), col("n_docs"))).as("m"))
      .select(col(xCol), col(s"m.$yCol").as("best_y"),
        col("m.n_docs").as("n_docs"))
      .localCheckpoint(true) // x-domain-sized; read twice below
    h.as("a")
      .join(h.as("b"), col(s"b.$xCol") < col(s"a.$xCol"), "left")
      .groupBy(col(s"a.$xCol").as(xCol),
        col("a.best_y").as("best_y"), col("a.n_docs").as("n_docs"))
      .agg(max(col("b.best_y")).as("__prefix_best"))
      .where(col("__prefix_best").isNull ||
        col("best_y") > col("__prefix_best"))
      .select(col(xCol), col("best_y"), col("n_docs"))
  }
}
