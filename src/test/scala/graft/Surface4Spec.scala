package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-5 operator tests: fixed-point ratio quantization, composite-key
  * arg-max determinism, sorted top-k lists, n-gram contamination, and
  * element-wise mean pooling — the expression logic behind the
  * Surface4Queries judged set, on in-memory frames.
  */
class Surface4Spec extends SparkSpec {
  import spark.implicits._

  test("punctRatio counts punctuation, not its complement") {
    // "ab, c!" → lower keeps "ab, c!"; stripping [a-z0-9 ] leaves ",!"
    val got = Seq("ab, c!").toDF("text")
      .select(TextAnalysis.punctRatio($"text").as("r"))
      .as[Double].head()
    assert(math.abs(got - 2.0 / 6.0) < 1e-12)
  }

  test("composite cents⊕key arg-max is deterministic under balance ties") {
    val df = Seq(
      (1, 7L, "low", 10.00), (1, 3L, "tie_a", 55.55),
      (1, 9L, "tie_b", 55.55)).toDF("grp", "key", "name", "bal")
    val composite = round($"bal" * 100).cast("long") * lit(1000000L) + $"key"
    val got = df.groupBy($"grp")
      .agg(max_by($"name", composite).as("mx"),
        min_by($"name", composite).as("mn"))
      .as[(Int, String, String)].head()
    // equal balances resolve by the higher/lower key, never arbitrarily
    assert(got._2 === "tie_b" && got._3 === "low")
  }

  test("sorted-slice top-3 orders by balance desc then key asc") {
    val df = Seq(
      (1, 1L, "a", 5.0), (1, 2L, "b", 9.0), (1, 3L, "c", 9.0),
      (1, 4L, "d", 1.0), (1, 5L, "e", 7.0)).toDF("grp", "ck", "nm", "bal")
    val got = df.groupBy($"grp")
      .agg(array_join(
        transform(
          slice(sort_array(collect_list(struct(
            (-$"bal").as("negbal"), $"ck", $"nm"))), 1, 3),
          x => x.getField("nm")), ",").as("top3"))
      .as[(Int, String)].head()._2
    assert(got === "b,c,e") // 9.0(ck2), 9.0(ck3), 7.0
  }

  test("bigram contamination fraction against a benchmark slice") {
    val docs = Seq(
      (0L, "alpha beta gamma"),         // benchmark (id % 20 == 0)
      (1L, "alpha beta delta"),         // shares "alpha beta" → 1/2
      (2L, "x y"))                      // no overlap → 0/1
      .toDF("doc_id", "text")
    val sh = docs
      .select($"doc_id", TextAnalysis.tokens($"text").as("tk"))
      .select($"doc_id",
        explode(TextAnalysis.wordShinglesFromTokens($"tk")).as("s"))
    val bench = sh.where($"doc_id" % 20 === 0)
      .select("s").distinct().withColumn("hit", lit(1L))
    val got = sh.where($"doc_id" % 20 =!= 0)
      .join(broadcast(bench), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce($"hit", lit(0L))).as("n_hit"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 2L, 1L), (2L, 1L, 0L)))
  }

  test("fixed-point mean pooling is exact per (label, dim)") {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f), 0), (2L, Seq(3.0f, 4.0f), 0),
      (3L, Seq(10.0f, 0.5f), 1)).toDF("vec_id", "embedding", "label")
    val got = df
      .select($"label".cast("long").as("label"), posexplode($"embedding"))
      .select($"label", $"pos".cast("long").as("pos"),
        floor($"col".cast("double") * lit(1e7)).cast("long").as("q"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), sum($"q").as("sq"))
      .select($"label", $"pos",
        ($"sq".cast("double") / lit(1e7) / $"n").as("m"))
      .as[(Long, Long, Double)].collect()
      .map { case (l, p, m) => (l, p) -> m }.toMap
    assert(got((0L, 0L)) === 2.0 && got((0L, 1L)) === 1.0)
    assert(got((1L, 0L)) === 10.0 && got((1L, 1L)) === 0.5)
  }

  test("frame sampling keeps every k-th fixed-size frame, drops empties") {
    import graft.operators.Multimodal
    val media = Seq(
      Multimodal.MediaRow(1L, "video/fake",
        Array.tabulate(16)(_.toByte), 4, 4),   // 4 frames → keep 0 and 2
      Multimodal.MediaRow(2L, "video/fake", Array.emptyByteArray, 0, 0))
      .toDS()
    val got = Multimodal.sampleFrameHex(media, frameSize = 4, everyK = 2)
      .as[(Long, Int, String, String)].collect().toSeq
    assert(got === Seq((1L, 2, "00010203", "08090a0b")))
  }

  test("null-safe join matches the null group to itself") {
    val a = Seq((Option.empty[String], 3L), (Some("x"), 2L))
      .toDF("seg", "n_a")
    val b = Seq((Option.empty[String], 1L), (Some("y"), 5L))
      .toDF("seg2", "n_b")
    val got = a.join(b, $"seg" <=> $"seg2")
      .select($"seg", $"n_a", $"n_b")
      .as[(Option[String], Long, Long)].collect().toSeq
    // an equi-join would drop the null row; <=> keeps exactly it
    assert(got === Seq((None, 3L, 1L)))
  }

  test("z-scores from integer sufficient statistics are exact") {
    // lang g: lengths 2, 4, 6 → mean 4, var_pop 8/3
    val d = Seq((1L, "g", 2L), (2L, "g", 4L), (3L, "g", 6L))
      .toDF("doc_id", "lang", "ntok")
    val stats = d.groupBy($"lang".as("lang2"))
      .agg(count(lit(1)).as("n"), sum($"ntok").as("sx"),
        sum($"ntok" * $"ntok").as("sxx"))
    val nd = $"n".cast("double")
    val mean = $"sx".cast("double") / nd
    val variance = $"sxx".cast("double") / nd - mean * mean
    val got = d.join(broadcast(stats), $"lang" === $"lang2")
      .select($"doc_id", (($"ntok".cast("double") - mean) / sqrt(variance))
        .as("z"))
      .as[(Long, Double)].collect().toMap
    // reference follows the query's exact operation order (sxx/n - mean²,
    // not the algebraically-equal 8/3): the guarantee is same-formula
    // bit-stability, and only the same double sequence reproduces it
    val sd = math.sqrt(56.0 / 3.0 - 4.0 * 4.0)
    assert(got(1L) === (2.0 - 4.0) / sd && got(2L) === 0.0 &&
      got(3L) === (6.0 - 4.0) / sd)
  }

  test("token-count histogram bucket edges (floor n/16)") {
    val df = Seq.tabulate(40)(i => (i.toLong, ("w " * i).trim))
      .toDF("doc_id", "text")
    val got = df
      .select(TextAnalysis.tokenCount($"text").as("ntok"))
      .groupBy(floor($"ntok" / lit(16.0)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    // ntok 0..15 → bucket 0 (16 docs), 16..31 → 1 (16), 32..39 → 2 (8)
    assert(got === Map(0L -> 16L, 1L -> 16L, 2L -> 8L))
  }
}
