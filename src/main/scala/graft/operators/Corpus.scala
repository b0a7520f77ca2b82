package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-management operators for training-data pipelines: stable hash
  * splits, context-window sequence packing, and cross-split
  * decontamination.
  *
  * Scale design (100 TB): the split is a pure narrow expression of the
  * document id (no state, no shuffle — identical assignment on any
  * cluster and under retries); packing shuffles once on the shard key
  * and sorts only within shards (never a global order); contamination
  * is one semi join on a constant-width fingerprint key.
  */
object Corpus {

  /** Deterministic percentile bucket of a stable id: md5-derived,
    * engine-portable, independent of partitioning — the property that
    * makes a train/test split reproducible across engines and reruns.
    */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast(StringType).cast(BinaryType)), 1, 4), 16, 10)
      .cast(LongType) % buckets

  /** Split assignment from the hash bucket (defaults: 90/5/5). */
  def splitName(bucket: Column, trainPct: Int = 90, valPct: Int = 5): Column =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")

  /** Context-window sequence packing: assign each row to a fixed-size
    * bin by the running total of `weight` (token count) per shard. The
    * bin is derived from the PRE-row total, so a row starts a new bin
    * only when the previous rows filled the current one. Sequential by
    * nature → partitioned by `shard`: one exchange, per-shard sort.
    */
  def packSequences(df: DataFrame, shard: String, order: String,
                    weight: String, windowTokens: Int,
                    cumCol: String = "cum_tok",
                    binCol: String = "bin"): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(cumCol, sum(col(weight)).over(w))
      .withColumn(binCol, expr(s"($cumCol - $weight) div $windowTokens"))
  }

  /** Cross-split contamination: rows of non-train splits whose `key`
    * (canonical fingerprint) also appears in the train split. The
    * decontamination pass run before any evaluation set is trusted.
    */
  def contamination(df: DataFrame, key: String, split: String): DataFrame = {
    val train = df.where(col(split) === "train").select(key).distinct()
    df.where(col(split) =!= "train").join(train, Seq(key), "left_semi")
  }

  /** Sliding-window document chunking: split each document's token array
    * (column `tk`) into windows of `window` tokens advancing by `stride`
    * (overlap = window - stride) — the context-window segmentation pass
    * between cleaning and tokenized-example serialization. A narrow
    * generate stage fused with the scan: no shuffle, trivially linear at
    * 100 TB. The final partial window is kept (standard practice; the
    * packer downstream handles ragged tails).
    */
  def chunkTokens(df: DataFrame, id: String, tk: String,
                  window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    // 1-based window starts: 1, 1+stride, ... — capped at
    // size - (window - stride) so the final chunk always contributes at
    // least one token past the previous chunk's coverage (a start
    // beyond that cap yields a chunk wholly contained in its
    // predecessor: duplicate training content). Every token is still
    // covered: the last kept chunk reaches min(cap+window-1, size) ≥
    // size. sequence() demands start <= stop for a positive step, so
    // empty token arrays short-circuit to no chunks
    val lastStart = greatest(size(col(tk)) - lit(window - stride), lit(1))
    val starts = when(size(col(tk)) > 0,
      sequence(lit(1), lastStart, lit(stride)))
      .otherwise(array().cast("array<int>"))
    df.select(col(id), col(tk), explode(starts).as("st"))
      .select(col(id),
        floor((col("st") - 1) / lit(stride)).as("chunk_id"),
        slice(col(tk), col("st"), lit(window)).as("chunk"))
      .select(col(id), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tok"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Boilerplate segment removal WITH reassembly (C4-style cleanup):
    * split each document into non-overlapping `segTokens`-token
    * segments, drop every segment whose verbatim text appears in ≥
    * `minDocs` distinct documents, and reassemble the survivors in
    * original order. Returns (id, clean_text, n_segs, n_removed); a
    * document fully consumed by boilerplate keeps a row with ''.
    *
    * Plan: one exchange to (doc, seg_id) for segment assembly, one
    * hash-agg on segment text for the frequency side — which collapses
    * to the (tiny) repeated-segment list and joins back as a broadcast
    * — and a per-document sort_array over collected (seg_id, seg)
    * structs for reassembly. No global sort, no self-join; at 100 TB
    * every stage is a narrow map or an equi-key exchange.
    */
  def segmentDedup(df: DataFrame, id: String, textCol: String,
                   segTokens: Int, minDocs: Int): DataFrame = {
    val toks = df.select(col(id),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val segs = toks
      .groupBy(col(id), floor(col("pos") / segTokens).as("seg_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), " ").as("seg"))
    val dup = segs.groupBy(col("seg"))
      .agg(countDistinct(col(id)).as("nd"))
      .where(col("nd") >= minDocs)
      .select(col("seg"), lit(true).as("dup"))
    segs.join(broadcast(dup), Seq("seg"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_segs"),
        count(when(col("dup"), 1)).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(
            when(col("dup").isNull, struct(col("seg_id"), col("seg"))))),
          x => x.getField("seg")), " ").as("clean_text"))
      .select(col(id), col("clean_text"), col("n_segs"), col("n_removed"))
  }
}
