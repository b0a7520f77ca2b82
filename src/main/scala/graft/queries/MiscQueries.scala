package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Remaining judged extension queries: approximate distinct (E3) and the
  * multimodal binary-column pipeline (§2.6).
  *
  * `e3_approx_distinct` cannot expose the raw HLL++ estimate to the
  * value oracle (Spark's and DuckDB's sketches legitimately disagree:
  * 151 vs 150 true on sf0.001 o_custkey), so the judged columns are the
  * exact counts plus a boolean asserting the HLL++ estimate landed
  * within ±10% of exact (rsd=0.02 → that is a ≥5-sigma bound; HLL is
  * deterministic per dataset, so the check is stable). The oracle
  * computes the exact counts and expects TRUE — a full hash-checked
  * verdict on the approx path instead of a rows-only count.
  */
object MiscQueries {
  import Tables._

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E3: HLL++ approximate distinct, judged via exact counts + an
    // in-bounds assertion on the estimate
    "e3_approx_distinct" -> ((s, dir) => {
      def ok(c: String) =
        (approx_count_distinct(col(c), 0.02).cast("double") /
          countDistinct(col(c))).between(0.9, 1.1)
      t(s, dir, "orders").agg(
        countDistinct(col("o_custkey")).as("exact_custkeys"),
        ok("o_custkey").as("approx_custkeys_ok"),
        countDistinct(col("o_orderpriority")).as("exact_priorities"),
        ok("o_orderpriority").as("approx_priorities_ok"))
    }),

    // Multimodal: binary media column + metadata → per-partition REAL
    // PNG decode (javax.imageio) → features. The fixture encodes each
    // doc as a genuine (n_chars%64+1)×4 grayscale PNG whose pixels
    // cycle the 16 md5(text) bytes; PNG is lossless, so the decoded
    // raster — and thus every judged feature — is exactly reproducible
    // in SQL from md5(text) without parsing a container.
    "e6_media_features" -> ((s, dir) => {
      val fixture = MediaFixtures.png(s, dir)
      val features = Multimodal.extractFeatures(
        Multimodal.toMediaDataset(fixture), resizeStride = 4)
      features.toDF().select(
        col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("mean_byte"),
        length(col("thumb")).cast("long").as("thumb_bytes"))
    }),

    // Integer-exact image statistics over REAL decoded pixels: min /
    // max / sum / sum-of-squares and the exact variance numerator
    // n·Σx² − (Σx)² — the per-image quality gate (blank / low-contrast
    // detection) of a media-curation pass, with zero floats in the
    // judged frame. PNG losslessness makes every column reproducible
    // from the fixture's md5 pixel layout.
    "e94_image_stats" -> ((s, dir) => {
      val fixture = MediaFixtures.png(s, dir)
      Multimodal.imageStats(Multimodal.toMediaDataset(fixture))
        .select(col("doc_id"),
          col("n_px").cast("long").as("n_px"),
          col("px_min").cast("long").as("px_min"),
          col("px_max").cast("long").as("px_max"),
          col("px_sum"), col("px_sumsq"),
          (col("n_px").cast("long") * col("px_sumsq") -
            col("px_sum") * col("px_sum")).as("var_num"))
    }),

    // Multimodal frame sampling over DECODED pixels: width×4 raster →
    // 4-pixel frames (one per image column group), keep every 2nd —
    // the video keyframe-sampling shape, hex-encoded so the kept
    // frames themselves are value-judged
    "e6_frame_sample" -> ((s, dir) => {
      val fixture = MediaFixtures.png(s, dir)
      Multimodal.sampleFrameHex(Multimodal.toMediaDataset(fixture),
        frameSize = 4, everyK = 2)
        .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
          col("f0"), col("f1"))
    }))

  val oracles: Map[String, String] = Map(
    "e3_approx_distinct" ->
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys,
         TRUE AS approx_custkeys_ok,
         CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS exact_priorities,
         TRUE AS approx_priorities_ok
         FROM orders""",
    // decoded raster = 4·w pixels (w = n_chars%64+1) cycling the 16
    // md5(text) bytes: byte j (1-based) appears N//16 + (j<=N%16)
    // times; thumb = every 4th pixel of N=4w → w bytes
    "e6_media_features" ->
      """SELECT doc_id,
         CAST(4 * ((d.n_chars % 64) + 1) AS BIGINT) AS n_bytes,
         (SELECT CAST(SUM(CAST('0x' || substr(md5(d.text), 2*g.i - 1, 2)
                              AS BIGINT)
                  * ((4 * ((d.n_chars % 64) + 1)) // 16
                     + CASE WHEN g.i <= (4 * ((d.n_chars % 64) + 1)) % 16
                            THEN 1 ELSE 0 END)) AS DOUBLE)
                / (4 * ((d.n_chars % 64) + 1))
          FROM generate_series(1, 16) AS g(i)) AS mean_byte,
         CAST((d.n_chars % 64) + 1 AS BIGINT) AS thumb_bytes
         FROM documents d""",
    // decoded raster stats from the md5 pixel cycle: byte j (1-based)
    // appears m_j = N//16 + (j<=N%16) times; min/max range over bytes
    // with m_j>0, the moments weight by m_j — all BIGINT-exact
    "e94_image_stats" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h,
              4 * ((n_chars % 64) + 1) AS N FROM documents),
          px AS (SELECT d.doc_id, d.N,
              CAST('0x' || substr(d.h, 2*g.i - 1, 2) AS BIGINT) AS b,
              (d.N // 16)
                + CASE WHEN g.i <= d.N % 16 THEN 1 ELSE 0 END AS m
            FROM d, generate_series(1, 16) AS g(i)),
          agg AS (SELECT doc_id, max(N) AS n_px,
              min(CASE WHEN m > 0 THEN b END) AS px_min,
              max(CASE WHEN m > 0 THEN b END) AS px_max,
              SUM(m * b) AS px_sum, SUM(m * b * b) AS px_sumsq
            FROM px GROUP BY doc_id)
          SELECT doc_id, CAST(n_px AS BIGINT) AS n_px,
            CAST(px_min AS BIGINT) AS px_min,
            CAST(px_max AS BIGINT) AS px_max,
            CAST(px_sum AS BIGINT) AS px_sum,
            CAST(px_sumsq AS BIGINT) AS px_sumsq,
            CAST(n_px * px_sumsq - px_sum * px_sum AS BIGINT) AS var_num
          FROM agg""",
    // decoded pixels: N=4w → w frames of 4; everyK=2 keeps ceil(w/2);
    // frame 0 = pixels 0-3 = digest bytes 0-3 (hex chars 1-8), second
    // KEPT frame = frame 2 = pixels 8-11 = digest bytes 8-11 (hex
    // chars 17-24), present iff w >= 3
    "e6_frame_sample" ->
      """SELECT doc_id,
         CAST((((n_chars % 64) + 1) + 1) // 2 AS BIGINT) AS n_frames,
         substr(md5(text), 1, 8) AS f0,
         CASE WHEN (n_chars % 64) + 1 >= 3 THEN substr(md5(text), 17, 8)
              ELSE '' END AS f1
         FROM documents""")
}
