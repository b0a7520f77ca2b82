package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fifth tranche (round 7): decorrelation-stress TPC-H shapes — the
  * nested correlated-aggregate and double-correlated anti-join patterns
  * that exercise Catalyst's subquery decorrelation (TPC-H Q17 and Q21,
  * adapted to this schema: no receipt/commit dates, so "late" means
  * shipped more than 60 days after the order date).
  *
  * Both are stated as SQL so the optimizer — not hand layout — must
  * turn the correlated subqueries into joins; the Explain audit shows
  * aggregate-join decorrelation, not per-row subquery execution. All
  * comparisons are exact-integer (quantities in cents), so the judged
  * result is identical on any engine at any parallelism.
  */
object Surface5Queries {
  import Tables._

  private def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(s, dir, n).createOrReplaceTempView(n))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q17: small-quantity-order revenue — a correlated aggregate
    // under a join. The 0.2·avg(l_quantity) threshold is cross-multiplied
    // into exact cents-integer arithmetic (5·cnt·q < Σq) so the filter
    // is reproducible; Catalyst decorrelates the two scalar subqueries
    // into one aggregated join on l_partkey
    "q67_tpch17" -> ((s, dir) => {
      views(s, dir, "lineitem", "part")
      s.sql(
        """SELECT
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS STRING)
               AS DOUBLE) / 7.0 AS avg_yearly,
             count(*) AS n
           FROM lineitem, part
           WHERE p_partkey = l_partkey
             AND p_brand = 'Brand#23'
             AND 5 * (SELECT count(*) FROM lineitem l2
                      WHERE l2.l_partkey = p_partkey)
                   * CAST(round(l_quantity * 100) AS BIGINT)
                 < (SELECT SUM(CAST(round(l2.l_quantity * 100) AS BIGINT))
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""")
    }),

    // TPC-H Q21: suppliers who were the ONLY late supplier in a
    // multi-supplier finished order — EXISTS plus NOT EXISTS, each
    // correlated on l1.l_orderkey and (for l3) on o_orderdate from a
    // DIFFERENT outer table: the decorrelation-hostile shape. Catalyst
    // must plan a semi-join and an anti-join against lineitem, both
    // hash-partitioned on l_orderkey — no per-row subqueries
    "q68_tpch21" -> ((s, dir) => {
      views(s, dir, "supplier", "lineitem", "orders")
      s.sql(
        """SELECT s_name, count(*) AS numwait
           FROM supplier, lineitem l1, orders
           WHERE s_suppkey = l1.l_suppkey
             AND o_orderkey = l1.l_orderkey
             AND o_orderstatus = 'F'
             AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
             AND EXISTS (SELECT 1 FROM lineitem l2
                         WHERE l2.l_orderkey = l1.l_orderkey
                           AND l2.l_suppkey <> l1.l_suppkey)
             AND NOT EXISTS (SELECT 1 FROM lineitem l3
                             WHERE l3.l_orderkey = l1.l_orderkey
                               AND l3.l_suppkey <> l1.l_suppkey
                               AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
           GROUP BY s_name
           ORDER BY numwait DESC, s_name
           LIMIT 100""")
    }),

    // Recall@10 of single-probe vs two-probe IVF against the exact
    // scan — the measured evidence that multi-probe buys recall at a
    // fixed cell count (provably n_hit2 ≥ n_hit1: the two-probe
    // candidate pool contains the one-probe pool, and any true top-10
    // member in a pool is always in that pool's top-10)
    "e34_ivf_recall" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val exact = SimilarityQueries.all("e2_topk_double")(s, dir)
        .select("vec_id")
      val p1 = SimilarityQueries.all("e2_ivf")(s, dir).select("vec_id")
      val p2 = SimilarityQueries.all("e33_ivf_probe2")(s, dir)
        .select("vec_id")
      exact.join(p1, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit1"))
        .crossJoin(exact.join(p2, Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("n_hit2")))
        .select(lit(10L).as("k"), col("n_hit1"), col("n_hit2"),
          (col("n_hit1").cast("double") / lit(10.0)).as("recall_1probe"),
          (col("n_hit2").cast("double") / lit(10.0)).as("recall_2probe"),
          (col("n_hit2") >= col("n_hit1")).as("multiprobe_no_worse"))
    }))

  val oracles: Map[String, String] = Map(
    // VARCHAR route on the decimal total: DuckDB's direct DECIMAL→DOUBLE
    // double-rounds past 2^53; string parse is correctly rounded
    "q67_tpch17" ->
      """SELECT
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS VARCHAR)
             AS DOUBLE) / 7.0 AS avg_yearly,
           count(*) AS n
         FROM lineitem, part
         WHERE p_partkey = l_partkey
           AND p_brand = 'Brand#23'
           AND 5 * (SELECT count(*) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
                 * CAST(round(l_quantity * 100) AS BIGINT)
               < (SELECT SUM(CAST(round(l2.l_quantity * 100) AS BIGINT))
                  FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",
    "q68_tpch21" ->
      """SELECT s_name, count(*) AS numwait
         FROM supplier, lineitem l1, orders
         WHERE s_suppkey = l1.l_suppkey
           AND o_orderkey = l1.l_orderkey
           AND o_orderstatus = 'F'
           AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY s_name
         ORDER BY numwait DESC, s_name
         LIMIT 100""",
    "e34_ivf_recall" ->
      s"""WITH ex AS (${SimilarityQueries.doubleCosineSql}),
          a1 AS (${SimilarityQueries.ivfSql}),
          a2 AS (${SimilarityQueries.ivfMulti2Sql})
          SELECT CAST(10 AS BIGINT) AS k,
            (SELECT count(*) FROM ex
             WHERE vec_id IN (SELECT vec_id FROM a1)) AS n_hit1,
            (SELECT count(*) FROM ex
             WHERE vec_id IN (SELECT vec_id FROM a2)) AS n_hit2,
            CAST((SELECT count(*) FROM ex
             WHERE vec_id IN (SELECT vec_id FROM a1)) AS DOUBLE) / 10.0
              AS recall_1probe,
            CAST((SELECT count(*) FROM ex
             WHERE vec_id IN (SELECT vec_id FROM a2)) AS DOUBLE) / 10.0
              AS recall_2probe,
            (SELECT count(*) FROM ex WHERE vec_id IN (SELECT vec_id FROM a2))
              >= (SELECT count(*) FROM ex
                  WHERE vec_id IN (SELECT vec_id FROM a1))
              AS multiprobe_no_worse""")
}
