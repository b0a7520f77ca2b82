package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches as declarative Catalyst plans.
  *
  * Count–Min (Cormode & Muthukrishnan 2005): `depth` md5-derived hash
  * rows × `width` buckets; a key's estimate is the MIN of its cells,
  * an overestimate never an underestimate. Cell frames are plain
  * (j, b, cell) DataFrames, so shard sketches merge by a cell-wise
  * sum — unionByName + groupBy, or additive streaming state (judged
  * as `c44_stream_countmin`).
  *
  * Scale shape (100 TB): build the cells from a pre-aggregated
  * (key, weight) frame — for text, the word-TYPE histogram — so the
  * sketch derivation is domain-bounded after one corpus pass; the
  * cell frame itself is `depth × width` rows at ANY corpus size.
  * The md5 bucket hash is exactly reproducible in SQL
  * (`'0x' || substr(md5(...), 1, 8) % width`), which is what lets
  * the DuckDB oracle rebuild the sketch bit-for-bit (`e168_countmin`).
  */
object Sketches {

  /** Bucket of `key` in hash row `j`: an exact integer from the md5
    * hex prefix of `"cm<j>|<key>"` — partition-invariant and
    * oracle-expressible.
    */
  def cmBucket(j: Int, key: Column, width: Long): Column =
    pmod(conv(substring(md5(concat(lit(s"cm$j|"), key)
      .cast("binary")), 1, 8), 16, 10).cast("long"), lit(width))

  /** Count–Min cell frame (columns `j`, `b`, `cell`) from a weighted
    * key frame: every key adds its weight to one cell per hash row.
    * One hash exchange on (j, b); `depth × width` result rows.
    */
  def countMinCells(keyed: DataFrame, key: Column, weight: Column,
                    depth: Int = 4, width: Long = 64L): DataFrame =
    keyed
      .select(weight.as("__w"), posexplode(array((0 until depth).map(j =>
        cmBucket(j, key, width)): _*)).as(Seq("j", "b")))
      .groupBy("j", "b").agg(sum(col("__w")).as("cell"))

  /** Merge shard cell frames by cell-wise sum — Count–Min's defining
    * property (the coordinator step of a sharded pipeline).
    */
  def countMinMerge(shards: Seq[DataFrame]): DataFrame =
    shards.reduce(_ unionByName _)
      .groupBy("j", "b").agg(sum(col("cell")).as("cell"))

  /** Point-query estimates for a (small, broadcastable) probe frame:
    * attaches `est_cnt` = min over hash rows of the probed cells.
    * Probe columns pass through (they must not be named `j`, `b`,
    * `cell`, or `est_cnt`). A bucket with no cell row counts as 0 —
    * a key the sketch never saw estimates 0 (or its collision mass),
    * never silently drops.
    */
  def countMinLookup(cells: DataFrame, probes: DataFrame, key: Column,
                     depth: Int = 4, width: Long = 64L): DataFrame = {
    val passThrough = probes.columns.map(col).toSeq
    // Broadcast the cells side: it is the depth×width-bounded frame, and
    // the preserved (left) side of an outer join can never host the build
    // anyway — a hint on probes would be silently ignored.
    probes
      .select(passThrough :+ posexplode(array((0 until depth).map(j =>
        cmBucket(j, key, width)): _*)).as(Seq("j", "b")): _*)
      .join(broadcast(cells), Seq("j", "b"), "left")
      .groupBy(passThrough: _*)
      .agg(min(coalesce(col("cell"), lit(0L))).as("est_cnt"))
  }
}
