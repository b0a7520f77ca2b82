package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Quantiles, TextAnalysis}

/** Round-8 surface growth, fifth wave: two op families the inventory
  * did not yet have — a mergeable frequency sketch (count-min) and
  * bulk-synchronous link analysis (PageRank) over a join-derived
  * graph.
  *
  * Both follow the house determinism rules: md5-derived hashing for
  * engine-portable pseudo-randomness, and integer fixed-point
  * arithmetic wherever iteration would otherwise accumulate
  * order-dependent float error (a PageRank sum must hash-match the
  * oracle under ANY partitioning and retry schedule, so every
  * per-edge contribution is an exact BIGINT).
  */
object Surface15Queries {
  import Tables._

  /** Count-min geometry: d independent hash rows × w buckets. Tiny on
    * purpose (so collisions actually happen at the judged sf and the
    * overestimate property is exercised, not vacuous); production uses
    * w in the thousands. */
  private val cmD = 3
  private val cmW = 64L

  /** Bucket of `tok` under hash row `d`: first 8 md5 hex chars of
    * "d_tok" as an int, mod w — the same derivation the oracle writes
    * in DuckDB SQL, so sketch cells match cell-for-cell. */
  private def cmBucket(d: Int, tok: Column): Column =
    pmod(conv(substring(md5(concat(lit(s"${d}_"), tok)
      .cast("binary")), 1, 8), 16, 10).cast("long"), lit(cmW))

  /** PageRank fixed-point scale: ranks live in parts-per-10^12. */
  private val prS = 1000000000000L
  private val prIters = 5

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Count-min sketch — THE mergeable frequency structure for token
    // statistics at corpus scale: d×w counters absorb an unbounded
    // token stream, cells sum across shards/days/partitions, and the
    // estimate for any token is min over rows of its cell (always ≥
    // the true count — one-sided error). Judged: the sketch built from
    // the documents token stream vs exact counts for the 10 most
    // frequent tokens, with the overestimate invariant as a column.
    // Scale shape: one narrow tokenize scan; map-side partial agg
    // means the exchange carries ≤ d·w cells per task regardless of
    // input size — the sketch never grows with the corpus. The probe
    // side is 10 rows joined against a ≤ d·w-row broadcast
    "e70_countmin" -> ((s, dir) => {
      val toks = tBalanced(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val cells = toks.select(col("tok"),
        explode(array((0 until cmD).map(d =>
          struct(lit(d).as("d"), cmBucket(d, col("tok")).as("bucket"))): _*))
          .as("cell"))
        .groupBy(col("cell.d").as("d"), col("cell.bucket").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val probes = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("tok")).limit(10)
      val probeCells = probes.select(col("tok"), col("exact"),
        explode(array((0 until cmD).map(d =>
          struct(lit(d).as("d"), cmBucket(d, col("tok")).as("bucket"))): _*))
          .as("cell"))
        .select(col("tok"), col("exact"),
          col("cell.d").as("d"), col("cell.bucket").as("bucket"))
      probeCells.join(broadcast(cells), Seq("d", "bucket"))
        .groupBy("tok", "exact").agg(min(col("cnt")).as("est"))
        .select(col("tok"), col("exact"), col("est"),
          (col("est") >= col("exact")).as("overestimate_ok"))
    }),

    // PageRank over the supplier↔customer fulfillment graph (edges =
    // distinct (customer, supplier) pairs that share an order line,
    // walked in both directions) — the link-analysis op behind
    // web-graph quality weighting in corpus curation (rank a page by
    // who links to it, weight its documents by the rank). Exact
    // integer fixed point: ranks are parts-per-1e12 BIGINTs, each
    // neighbor contribution is rank div degree, damping is
    // (85·sum) div 100 — no float ever enters, so 5 iterations
    // hash-match the oracle's unrolled CTEs exactly. Scale shape:
    // bulk-synchronous iteration, one hash exchange on dst per step
    // (the groupBy); the static edge+degree frame is built once and
    // persisted, ranks are the only thing that moves. The n-node
    // count is the query's one driver-side scalar (a 1-row count)
    "e71_pagerank" -> ((s, dir) => {
      val pairs = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("c"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("s"))
        .distinct()
      // static per-iteration join side, a durable checkpoint (once per
      // sf × testdata fingerprint): every iteration (and the node
      // count) is a narrow scan of the (src, dst, od) frame — nothing
      // stays pinned in executor memory after the query, and on a
      // cluster the stage is durable storage
      val edgesD = Stage.durableFrame(s, "pr-edges", dir) {
        val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
          .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
        val deg = edges.groupBy("src").agg(count(lit(1)).as("od"))
        edges.join(deg, "src")
      }
      val n = edgesD.select(countDistinct(col("src"))).head().getLong(0)
      val tele = (15L * (prS / n)) / 100L
      var ranks = edgesD.select(col("src").as("node")).distinct()
        .withColumn("r", lit(prS / n))
      for (_ <- 1 to prIters) {
        ranks = edgesD.join(ranks, edgesD("src") === ranks("node"))
          .select(col("dst"), Quantiles.ldiv(col("r"), col("od")).as("contrib"))
          .groupBy("dst")
          .agg((lit(tele) +
            Quantiles.ldiv(lit(85L) * sum(col("contrib")), 100L)).as("r"))
          .withColumnRenamed("dst", "node")
      }
      ranks.orderBy(col("r").desc, col("node")).limit(20)
        .select(col("node"), col("r").as("rank_fp"))
    }))

  private val cmBucketSqlFmt =
    "CAST('0x' || substr(md5('%d_' || tok), 1, 8) AS BIGINT) %% " + cmW

  val oracles: Map[String, String] = Map(
    "e70_countmin" -> {
      val cellUnion = (0 until cmD).map { d =>
        s"SELECT ${d} AS d, ${cmBucketSqlFmt.format(d)} AS bucket, tok FROM toks"
      }.mkString(" UNION ALL ")
      s"""WITH toks AS (
            SELECT unnest(list_filter(
              string_split_regex(lower(text), '[^a-z0-9]+'),
              x -> x <> '')) AS tok
            FROM documents),
          cells AS (SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
                    FROM ($cellUnion) GROUP BY d, bucket),
          probes AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact
                     FROM toks GROUP BY tok
                     ORDER BY exact DESC, tok LIMIT 10),
          pc AS (${(0 until cmD).map(d =>
              s"SELECT tok, exact, ${d} AS d, ${cmBucketSqlFmt.format(d)} AS bucket FROM probes")
            .mkString(" UNION ALL ")})
          SELECT p.tok, p.exact, CAST(min(c.cnt) AS BIGINT) AS est,
                 min(c.cnt) >= p.exact AS overestimate_ok
          FROM pc p JOIN cells c ON p.d = c.d AND p.bucket = c.bucket
          GROUP BY p.tok, p.exact"""
    },
    "e71_pagerank" -> {
      val iters = (1 to prIters).map { k =>
        s"""r$k AS (
             SELECT e.dst AS node,
               CAST((15 * ($prS // nn.n)) // 100
                 + (85 * sum(r.r // e.od)) // 100 AS BIGINT) AS r
             FROM edges e JOIN r${k - 1} r ON e.src = r.node, nn
             GROUP BY e.dst, nn.n)"""
      }.mkString(",\n          ")
      s"""WITH pairs AS (
            SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                   's' || CAST(l_suppkey AS VARCHAR) AS s
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          e0 AS (SELECT c AS src, s AS dst FROM pairs
                 UNION ALL SELECT s, c FROM pairs),
          deg AS (SELECT src, CAST(count(*) AS BIGINT) AS od
                  FROM e0 GROUP BY src),
          edges AS (SELECT e0.src, e0.dst, deg.od
                    FROM e0 JOIN deg ON e0.src = deg.src),
          nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
          r0 AS (SELECT src AS node, CAST($prS // nn.n AS BIGINT) AS r
                 FROM deg, nn),
          $iters
          SELECT node, r AS rank_fp FROM r$prIters
          ORDER BY r DESC, node LIMIT 20"""
    })
}
