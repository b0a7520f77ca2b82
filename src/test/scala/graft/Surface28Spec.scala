package graft

import org.apache.spark.sql.functions._

/** Round-18 wave gates: the c45 streaming twin's batch-equality check
  * and a first-principles census of e174's output shape (the
  * brute-force SemDeDup agreement itself lives in OperatorsSpec on a
  * controlled twin fixture).
  */
class Surface28Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("c45 streaming twin equals the e170 batch CUPED panel") {
    val batch = SparkEntry.queries("e170_cuped")(spark, dir)
      .collect().toSeq
    val stream = SparkEntry.queries("c45_stream_cuped")(spark, dir)
      .collect().toSeq
    assert(stream == batch)
  }

  test("e174: one row per vector, losers only from multi-member cells, " +
    "survivors nonempty per cell") {
    val corpus = graft.queries.Tables.t(spark, dir, "embeddings")
    val out = SparkEntry.queries("e174_semdedup")(spark, dir)
      .select("vec_id", "cell", "keep")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length.toLong === corpus.count(),
      "semDedup must emit exactly one decision per input vector")
    assert(out.map(_._1).distinct.length === out.length)
    val byCell = out.groupBy(_._2)
    byCell.foreach { case (cell, members) =>
      // pruning never empties a cluster: the pairwise rule always
      // keeps at least one member of any near-dup chain
      assert(members.exists(_._3), s"cell $cell lost every member")
      // a singleton cell can never lose its only member
      if (members.length == 1)
        assert(members.head._3, s"singleton cell $cell was pruned")
    }
    // the sf fixture must actually exercise the prune path
    assert(out.exists(!_._3), "fixture produced no pruned vectors")
  }
}
