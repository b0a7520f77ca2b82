package graft

import org.apache.spark.sql.functions._
import graft.queries.Surface17Queries

/** Round-10 additions: explicit cross-job Bloom semi-join and
  * prefix-filtered exact Jaccard join.
  */
class Surface17Spec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("driver-built bloom admits every true key (no false negatives)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val keys = spark.range(0, 1000).select(col("id"))
    val bf = keys.stat.bloomFilter("id", 2000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bfLit = lit(bos.toByteArray)
    // every inserted key must pass the filter — Bloom guarantees no
    // false negatives, which is what makes the exact-scrub result exact
    val missed = keys
      .where(!call_function("bloom_might_contain", bfLit, col("id")))
      .count()
    assert(missed == 0L)
    // and the filter must actually prune: over a disjoint key range the
    // pass-through rate is the fpp, not 100%
    val fp = spark.range(1000000, 1100000)
      .where(call_function("bloom_might_contain", bfLit, col("id")))
      .count()
    assert(fp < 5000L, s"bloom passed $fp of 100k disjoint keys")
  }

  test("q106 equals the plain exact semi-join (bloom is pruning-only)") {
    import graft.queries.Tables.{t, dsum}
    val got = Surface17Queries.all("q106_bloom_semi")(spark, sfDir)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val ord = t(spark, sfDir, "orders")
      .where(col("o_orderdate") >= lit("1996-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select("o_orderkey")
    val want = t(spark, sfDir, "lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity"), 2).as("q"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("band admission fold: earlier ids flag later ones, state carries") {
    import graft.streaming.BandAdmission.{fold, BandRow}
    // batch 1: doc 5 admitted, doc 7 flagged (5 < 7 shares the band)
    val (f1, mn1) = fold("X", Long.MaxValue,
      Seq(BandRow(7, "X"), BandRow(5, "X")))
    assert(f1.map(f => (f.doc_id, f.dup)) == Seq((5L, false), (7L, true)))
    assert(mn1 == 5L)
    // batch 2 against carried state: doc 9 flagged by batch-1's doc 5
    val (f2, mn2) = fold("X", mn1, Seq(BandRow(9, "X")))
    assert(f2.map(f => (f.doc_id, f.dup)) == Seq((9L, true)) && mn2 == 5L)
    // equal ids never flag each other
    val (f3, _) = fold("Y", Long.MaxValue,
      Seq(BandRow(4, "Y"), BandRow(4, "Y")))
    assert(f3.forall(!_.dup))
  }

  test("prefix filtering is lossless vs brute-force all-pairs Jaccard") {
    import graft.queries.Tables.t
    // brute-force truth at sf0.001: distinct token sets, all-pairs
    // intersection via token equi-join, threshold 3*inter >= na+nb
    val docs = t(spark, sfDir, "documents").where(col("doc_id") < 300)
    val tk = docs.select(col("doc_id"),
      explode(array_distinct(filter(
        split(lower(col("text")), "[^a-z0-9]+"),
        x => length(x) > 0))).as("tok"))
    val sz = tk.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = tk.as("a").join(tk.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    val want = inter
      .join(sz.select(col("doc_id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sz.select(col("doc_id").as("id_b"), col("n").as("n_b")), "id_b")
      .where(col("n_common") * 3 >= col("n_a") + col("n_b"))
      .select("id_a", "id_b", "n_common", "n_a", "n_b")
      .collect().map(_.toSeq).toSet
    val got = Surface17Queries.all("e87_prefix_join")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == want)
  }
}
