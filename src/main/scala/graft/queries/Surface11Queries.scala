package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 surface growth: training-pipeline shapes that were still
  * missing after the §2 inventory closed — exact per-group sampling
  * and the point-in-time dimension join every feature/label pipeline
  * needs for temporal correctness.
  */
object Surface11Queries {
  import Tables._

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // STRATIFIED sampling with an exact per-group quota: a training
    // mixture wants "exactly N docs per source", not Bernoulli's
    // approximately-N (sampleBy), and it wants the same N docs on
    // every engine and every rerun. Rank inside each stratum by a
    // stable md5 of the id (deterministic, uncorrelated with content)
    // and keep rank ≤ 20. One hash exchange on the stratum key, a
    // per-partition sort bounded by the largest stratum — no global
    // sort. At 100 TB with few huge strata the same plan holds because
    // the window's sort is (stratum-local, spillable); quota selection
    // could also early-stop per partition via limit pushdown.
    "e53_stratified_sample" -> ((s, dir) => {
      val key = md5(col("doc_id").cast("string"))
      t(s, dir, "documents")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source")).orderBy(key, col("doc_id")))
          .cast("long"))
        .where(col("rk") <= 20)
        .select(col("doc_id"), col("source"), col("rk"))
    }),

    // POINT-IN-TIME join (temporal correctness): each fact row joins
    // the dimension VERSION that was valid at the fact's event time —
    // the query that prevents feature leakage when training on
    // historical facts against an SCD2 dimension. The join is an
    // EQUI-join on the dimension key with the validity interval as a
    // residual predicate: versions-per-key is small (2 here, bounded
    // in any real SCD2), so the per-key filter is O(versions), and the
    // plan is the same single hash exchange as a plain dim join — no
    // range-join machinery, no broadcast of the fact side. The
    // version set is synthesized from customer (v2 opens 1997-01-01
    // for custkey % 3 = 0 with acctbal + 100), so every order matches
    // exactly one version by construction.
    "q91_pit_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val v2open = lit("1997-01-01").cast("timestamp")
      val never = lit("2999-01-01").cast("timestamp")
      val v1 = c.select(col("c_custkey"), col("c_acctbal"),
        lit("1990-01-01").cast("timestamp").as("eff_from"),
        when(col("c_custkey") % 3 === 0, v2open).otherwise(never)
          .as("eff_to"))
      val v2 = c.where(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), (col("c_acctbal") + 100.0).as("c_acctbal"),
          v2open.as("eff_from"), never.as("eff_to"))
      t(s, dir, "orders")
        .join(v1.unionByName(v2), col("o_custkey") === col("c_custkey") &&
          col("o_orderdate") >= col("eff_from") &&
          col("o_orderdate") < col("eff_to"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("c_acctbal").as("acctbal_at_order"))
    }))

  val oracles: Map[String, String] = Map(
    "e53_stratified_sample" ->
      """WITH r AS (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents)
         SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk <= 20""",
    "q91_pit_join" ->
      """WITH dim AS (
           SELECT c_custkey, c_acctbal,
                  TIMESTAMP '1990-01-01' AS eff_from,
                  CASE WHEN c_custkey % 3 = 0 THEN TIMESTAMP '1997-01-01'
                       ELSE TIMESTAMP '2999-01-01' END AS eff_to
           FROM customer
           UNION ALL
           SELECT c_custkey, c_acctbal + 100.0,
                  TIMESTAMP '1997-01-01', TIMESTAMP '2999-01-01'
           FROM customer WHERE c_custkey % 3 = 0)
         SELECT o_orderkey, o_custkey, o_orderdate,
                c_acctbal AS acctbal_at_order
         FROM orders JOIN dim ON o_custkey = c_custkey
           AND o_orderdate >= eff_from AND o_orderdate < eff_to""")
}
