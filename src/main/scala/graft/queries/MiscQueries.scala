package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Remaining judged extension queries: approximate distinct (E3) and the
  * multimodal binary-column pipeline (§2.6).
  *
  * `e3_approx_distinct` has no value oracle by design: Spark's HLL++ and
  * DuckDB's approx sketches legitimately disagree (measured: 151 vs 150
  * true on sf0.001 o_custkey), so the driver records the rows-only check;
  * the exact-count companions in the same row make the estimate's
  * quality visible in the dump.
  */
object MiscQueries {
  import Tables._

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E3: HLL++ approximate distinct + exact companions (rows-only)
    "e3_approx_distinct" -> ((s, dir) =>
      t(s, dir, "orders").agg(
        approx_count_distinct(col("o_custkey")).as("approx_custkeys"),
        countDistinct(col("o_custkey")).as("exact_custkeys"),
        approx_count_distinct(col("o_orderpriority")).as("approx_priorities"),
        countDistinct(col("o_orderpriority")).as("exact_priorities"))),

    // Multimodal: binary media column + metadata → per-partition stub
    // decode → features (mean byte value is exactly reproducible in SQL)
    "e6_media_features" -> ((s, dir) => {
      val fixture = Multimodal.fixtureFromDocuments(t(s, dir, "documents"))
      val features = Multimodal.extractFeatures(
        Multimodal.toMediaDataset(fixture), resizeStride = 4)
      features.toDF().select(
        col("doc_id"), col("n_bytes"), col("mean_byte"),
        length(col("thumb")).as("thumb_bytes"))
    }))

  val oracles: Map[String, String] = Map(
    // md5(text) = 16 payload bytes; mean byte value reproduced from the
    // hex string; thumb = every 4th byte of 16 → 4 bytes
    "e6_media_features" ->
      """SELECT doc_id, 16 AS n_bytes,
         (SELECT CAST(SUM(CAST('0x' || substr(md5(d.text), 2*g.i - 1, 2)
                              AS BIGINT)) AS DOUBLE) / 16
          FROM generate_series(1, 16) AS g(i)) AS mean_byte,
         4 AS thumb_bytes
         FROM documents d""")
}
