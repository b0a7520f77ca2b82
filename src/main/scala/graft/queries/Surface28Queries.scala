package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.{Dedup, Similarity}
import graft.streaming.StatefulOps

/** Round-18 wave — sibling-checked against the 376-query surface:
  *
  *  - `e174_semdedup` — SemDeDup semantic dedup (Abbas et al. 2023,
  *    arXiv:2303.09540), the embedding-CLUSTER-then-prune family that
  *    complements MinHash (lexical), SimHash (bit-vote) and cosine-LSH
  *    (bucketed pairs): every vector joins its nearest IVF centroid's
  *    cluster ([[Similarity.ivfCell]] — the e2_ivf index layout, plan-
  *    literal centroids), pair comparison is STRICTLY cluster-local
  *    (equi-join on the cell key, no cross-cluster pairs, never
  *    all-pairs), and of a near-dup pair the member CLOSER to its
  *    centroid is pruned — the paper keeps cluster-edge members to
  *    preserve diversity. Pair cosines ride the native codegen
  *    `vec_dot` with hoisted self-norms (one kernel call per pair, the
  *    e60/e1_embed_neardup discipline); both they and the centroid
  *    scores are the plain left-to-right double fold the oracle's
  *    list_reduce reproduces bit-for-bit. At 100 TB the
  *    centroid count scales with the corpus (the paper runs k ≈ 50k)
  *    so clusters stay O(1) and the corpus partitions by cell.
  *  - `c45_stream_cuped` — e170's CUPED panel through the REAL
  *    micro-batch engine (the c42/c43 twin discipline, judged on
  *    e170's batch oracle verbatim): each event ships BOTH per-user
  *    metric legs — `<user>|x` (post-midpoint purchase) and `<user>|c`
  *    (pre-midpoint view), w=0 rows included so every observed user
  *    reaches the state store in both legs — as monotone KeySum state
  *    over a two-chunk feed; the counter image collapses by
  *    max(total), pivots back to per-user (x, c), and feeds the SAME
  *    [[Surface27Queries.cupedPanel]] closed-form moment algebra. The
  *    experiment-window midpoint is batch-derived while BUILDING the
  *    staged feed (in production the pre/post boundary is experiment
  *    config, not stream-derived).
  *
  *  The r17 verdict's bloom-pruned-join item turned out to be ALREADY
  *  covered — the sibling check found `q92_runtime_filter` proving the
  *  optimizer-injected `might_contain` path and `q106_bloom_semi` the
  *  cross-job driver-built form — so this wave adds the PlanAuditSpec
  *  gate on q92's plan instead of a third sibling query.
  */
object Surface28Queries {
  import Tables._

  /** SemDeDup near-dup threshold: at the synthetic corpus's cosine
    * distribution (~99th pct ≈ 0.29) τ=0.3 prunes a real but sparse
    * near-dup set.
    */
  private val semThreshold = 0.3

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pair stage through the native codegen vec_dot (the e1_embed_neardup
    // discipline: the left-to-right double fold is bit-agreed with the
    // oracle's list_reduce, and the kernel skips the per-pair zipped-array
    // allocation the HOF fold pays — the x10 study measured the default
    // fixed-point HOF pair stage at 519 s vs ~13 s native)
    "e174_semdedup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val vd = (a: org.apache.spark.sql.Column,
                b: org.apache.spark.sql.Column) =>
        call_function("vec_dot", a, b)
      Dedup.semDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
        Similarity.syntheticCentroids(SimilarityQueries.ivfN, 64),
        semThreshold,
        selfDot = v => vd(v, v),
        pairCosine = (a, b, na, nb) => vd(a, b) / (sqrt(na) * sqrt(nb)))
    }),

    "c45_stream_cuped" -> ((s, dir) => {
      import s.implicits._
      val ev = events(s, dir).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("tm"),
        col("event_id"))
      val mm = broadcast(ev.agg(min(col("tm")).as("lo"),
        max(col("tm")).as("hi")))
      def leg(metric: String, w: org.apache.spark.sql.Column) =
        ev.crossJoin(mm).select(col("event_id"),
          concat(col("user_id").cast("string"), lit(s"|$metric"))
            .as("key"),
          w.as("w"))
      val keyed = leg("x",
          when(col("event_type") === "purchase" &&
            lit(2L) * col("tm") >= col("lo") + col("hi"), 1L)
            .otherwise(0L))
        .unionByName(leg("c",
          when(col("event_type") === "view" &&
            lit(2L) * col("tm") < col("lo") + col("hi"), 1L)
            .otherwise(0L)))
      val feed = Stage.durableChunkFeed("feed-c45", dir)(Seq(
        keyed.where(col("event_id") % 2 === 0).select("key", "w"),
        keyed.where(col("event_id") % 2 =!= 0).select("key", "w")))
      val tmp = Stage.tempDir("graft-c45-").toString
      val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val schema = StructType(Seq(StructField("key", StringType),
        StructField("w", LongType)))
      RuntimeQueries.withStatePartitions(s, 8) {
        Surface22Queries.withRocksDb(s) {
          StatefulOps.keySumStream(
            s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
              .parquet(feed).as[StatefulOps.KeyWeight])
            .writeStream
            .foreachBatch {
              (batch: Dataset[StatefulOps.KeySum], _: Long) =>
                batch.write.mode("append").parquet(out); ()
            }
            .option("checkpointLocation", ckpt)
            .outputMode("update").trigger(Trigger.AvailableNow).start()
            .awaitTermination()
        }
      }
      val perUser = s.read.parquet(out)
        .groupBy("key").agg(max(col("total")).as("t"))
        .select(split(col("key"), "\\|").getItem(0).cast("long")
          .as("user_id"),
          split(col("key"), "\\|").getItem(1).as("m"), col("t"))
        .groupBy("user_id")
        .agg(max(when(col("m") === "x", col("t"))).as("x"),
          max(when(col("m") === "c", col("t"))).as("c"))
        .select((col("user_id") % 2).as("grp"), col("x"), col("c"))
      Surface27Queries.cupedPanel(perUser)
    }))

  // ---- oracles ----

  private def semDedupSql: String = {
    import SimilarityQueries.{foldDot, ivfCellSql, ivfMaxScoreSql}
    s"""WITH a AS (SELECT vec_id,
           CAST(${ivfCellSql("embedding")} AS BIGINT) AS cell,
           ${ivfMaxScoreSql("embedding")} AS cscore,
           ${foldDot("embedding", "embedding")} AS nf,
           embedding
         FROM embeddings),
       p AS (SELECT x.vec_id AS ida, y.vec_id AS idb,
           x.cscore AS ca, y.cscore AS cb
         FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
         WHERE ${foldDot("x.embedding", "y.embedding")} /
           (sqrt(x.nf) * sqrt(y.nf)) > $semThreshold),
       losers AS (SELECT DISTINCT CASE WHEN ca > cb THEN ida
           WHEN ca < cb THEN idb ELSE greatest(ida, idb) END AS vec_id
         FROM p)
       SELECT a.vec_id, a.cell, round(a.cscore, 8) AS cscore,
         (l.vec_id IS NULL) AS keep
       FROM a LEFT JOIN losers l ON a.vec_id = l.vec_id"""
  }

  val oracles: Map[String, String] = Map(
    "e174_semdedup" -> semDedupSql,
    "c45_stream_cuped" -> Surface27Queries.cupedOracle)
}
