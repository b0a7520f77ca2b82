package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup}

/** Round-4 operator tests: connected components (duplicate clusters)
  * and sliding-window chunking.
  */
class Surface3Spec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents chains pairs into min-labeled clusters") {
    // two components: {1,2,3,4} (a path, diameter 3) and {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
  }

  test("connectedComponents handles a cycle and singleton-free output") {
    val edges = Seq((5L, 6L), (6L, 7L), (7L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((5L, 5L), (6L, 5L), (7L, 5L)))
  }

  test("contraction agrees with propagation on random graphs") {
    // deterministic pseudo-random edge lists of varied shape: sparse,
    // dense, and with duplicate/self edges
    for ((seed, n, m) <- Seq((1, 30, 20), (2, 50, 80), (3, 12, 60))) {
      val edges = (1 to m).map { i =>
        val h1 = scala.util.hashing.MurmurHash3.stringHash(s"cc$seed-$i-a")
        val h2 = scala.util.hashing.MurmurHash3.stringHash(s"cc$seed-$i-b")
        (Integer.toUnsignedLong(h1) % n, Integer.toUnsignedLong(h2) % n)
      }.toDF("id_a", "id_b")
      val prop = Dedup.connectedComponents(edges, "id_a", "id_b")
        .as[(Long, Long)].collect().sorted.toSeq
      val cont = Dedup.connectedComponentsContraction(edges, "id_a", "id_b")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(cont === prop, s"seed=$seed")
    }
  }

  test("propagation falls back to contraction past the sweep budget") {
    // a 120-node path has diameter 119 ≫ the default 50-sweep budget;
    // the fallback must still produce min labels for the one component
    val edges = (0L until 119L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === (0L to 119L).map(i => (i, 0L)))
  }

  test("int8 quantization round-trips within absmax/127 per element") {
    val df = Seq((1L, Seq(0.5f, -1.0f, 0.25f))).toDF("vec_id", "embedding")
    // the judged query's expression pipeline over an in-memory frame
    val got = df.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("vd"))
      .select($"vec_id", $"vd",
        array_max(transform($"vd", x => abs(x))).as("mx"))
      .select($"vec_id", $"mx",
        transform($"vd", x => floor(x * lit(127.0) / $"mx").cast("int"))
          .as("qv"))
      .as[(Long, Double, Seq[Int])].head()
    assert(got._2 === 1.0) // absmax
    // floor(0.5*127)=63, floor(-1*127)=-127, floor(0.25*127)=31
    assert(got._3 === Seq(63, -127, 31))
  }

  test("chunkTokens windows with stride, ragged tail, empty-doc drop") {
    val docs = Seq(
      (1L, (1 to 95).map(_.toString)), // 3 chunks: 50, 50 (41..90), 15
      (2L, Seq("a")),                  // single partial chunk
      (3L, Seq.empty[String]),         // no chunks
      (4L, (1 to 41).map(_.toString))) // ONE chunk: a start at 41 would
                                       // be wholly inside chunk 0
      .toDF("doc_id", "tk")
    val got = Corpus.chunkTokens(docs, "doc_id", "tk", window = 50,
      stride = 40)
      .select("doc_id", "chunk_id", "n_tok")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 0L, 50L), (1L, 1L, 50L), (1L, 2L, 15L),
      (2L, 0L, 1L), (4L, 0L, 41L)))
    // overlap: chunk 1 starts at token 41
    val c1 = Corpus.chunkTokens(docs.where($"doc_id" === 1L), "doc_id",
      "tk", 50, 40)
      .where($"chunk_id" === 1L).select("chunk_text").as[String].head()
    assert(c1.startsWith("41 42 ") && c1.endsWith(" 90"))
  }
}
