package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextAnalysis}

/** Unit tests for the round-3 additions: IVF cell assignment, sequence
  * packing, cross-split contamination, and the range-join/full-outer
  * query shapes.
  */
class Surface2Spec extends SparkSpec {
  import spark.implicits._

  test("syntheticCentroids is deterministic and in [-1, 1]") {
    val a = Similarity.syntheticCentroids(4, 64)
    val b = Similarity.syntheticCentroids(4, 64)
    assert(a === b)
    assert(a.flatten.forall(v => v >= -1f && v <= 1f))
    // distinct centroids (no two identical rows)
    assert(a.distinct.size === 4)
  }

  test("ivfCell assigns a vector nearest its own centroid") {
    val cents = Similarity.syntheticCentroids(4, 8).map(_.take(8))
    // a vector exactly on centroid j must land in cell j (cosine = 1)
    val df = cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("i", "v")
      .select(col("i"), Similarity.ivfCell(col("v"), cents).as("cell"))
    df.as[(Long, Int)].collect().foreach { case (i, cell) =>
      assert(cell === i.toInt, s"centroid $i landed in cell $cell")
    }
  }

  test("e9 packing: bins are contiguous and cumulative sums monotone") {
    val docs = (1L to 100L).map(i => (i, "tok " * (i % 17 + 1).toInt, "en"))
      .toDF("doc_id", "text", "lang")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id").rowsBetween(Long.MinValue, 0)
    val packed = docs
      .select(col("lang"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("bin", expr("(cum_tok - n_tok) div 64"))
      .orderBy("doc_id")
      .as[(String, Long, Long, Long, Long)].collect()
    // cum strictly increasing; bin nondecreasing, no gaps
    packed.sliding(2).foreach { case Array(p, n) =>
      assert(n._4 > p._4)
      assert(n._5 >= p._5 && n._5 <= p._5 + 1)
    }
    // each doc's bin derives from the PRE-doc total (first doc in bin 0)
    assert(packed.head._5 === 0L)
  }

  test("e10 contamination finds exactly the eval docs sharing a train fingerprint") {
    // doc 1 (train bucket by construction varies) — instead force splits
    // via explicit frame: the operator shape is fingerprint semi-join
    val d = Seq(
      (1L, "The cat sat.", "train"),
      (2L, "the CAT sat!!", "test"),  // same canonical form as 1
      (3L, "dogs run fast", "test"),
      (4L, "dogs run fast", "val"),   // dup within eval only — NOT contaminated
      (5L, "unique text here", "train")).toDF("doc_id", "text", "split")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val train = d.where(col("split") === "train").select("fp").distinct()
    val contam = d.where(col("split") =!= "train")
      .join(train, Seq("fp"), "left_semi")
      .select("doc_id").as[Long].collect().sorted
    assert(contam === Array(2L))
  }

  test("as-of join tolerance nulls stale matches, keeps fresh ones") {
    import graft.operators.AsofJoin
    val left = Seq((1L, 100L), (2L, 200L)).toDF("k", "t")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"))
    // right rows: k=1 at t=98 (fresh for tol=5), k=2 at t=150 (stale)
    val right = Seq((1L, 98L, 7.0, 1L), (2L, 150L, 9.0, 2L))
      .toDF("k", "t", "v", "rid")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"),
        col("v"), col("rid"))
    def run(tol: Option[String]) =
      AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts",
        Seq("v" -> "last_v"), col("rid"),
        tolerance = tol.map(expr))
        .select("k", "last_v").as[(Long, Option[Double])]
        .collect().sortBy(_._1)
    // unbounded: both match
    assert(run(None) === Array((1L, Some(7.0)), (2L, Some(9.0))))
    // 5-second bound: k=2's match is 50s stale → null
    assert(run(Some("INTERVAL 5 SECONDS")) ===
      Array((1L, Some(7.0)), (2L, None)))
    // forward direction: k=1 has no view at/after t=100 → null;
    // k=2 has none either (150 < 200) → null; flip data to check match
    val fwd = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts",
      Seq("v" -> "next_v"), col("rid"), direction = "forward")
      .select("k", "next_v").as[(Long, Option[Double])]
      .collect().sortBy(_._1)
    assert(fwd === Array((1L, None), (2L, None)))
    val rightLater = Seq((1L, 102L, 5.0, 3L)).toDF("k", "t", "v", "rid")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"),
        col("v"), col("rid"))
    val fwd2 = AsofJoin.asofJoin(left, rightLater, Seq("k"), "ts", "ts",
      Seq("v" -> "next_v"), col("rid"), direction = "forward")
      .select("k", "next_v").as[(Long, Option[Double])]
      .collect().sortBy(_._1)
    assert(fwd2 === Array((1L, Some(5.0)), (2L, None)))
  }

  test("change-log application: tombstoned keys vanish, last update wins") {
    import graft.cdc.Debezium
    import graft.sinks.Sinks
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
    val snapshot = Debezium.wrap(base, lit("r"), "t", lit(0L))
    val update = Debezium.wrap(
      Seq((2L, 99.0)).toDF("id", "v"), lit("u"), "t", lit(1L))
    val delete = Debezium.wrapDelete(
      Seq((3L, 30.0)).toDF("id", "v"), "t", lit(2L))
    val log = Debezium.unwrapWithDeletes(
      snapshot.unionByName(update).unionByName(delete), base.schema)
    val state = Sinks.applyChangeLog(log, Seq("id"), Seq("ts_ms"))
      .select("id", "v").as[(Long, Double)].collect().sortBy(_._1)
    assert(state === Array((1L, 10.0), (2L, 99.0)))
    // a delete followed by a re-create resurrects the key
    val recreate = Debezium.wrap(
      Seq((3L, 31.0)).toDF("id", "v"), lit("c"), "t", lit(3L))
    val log2 = Debezium.unwrapWithDeletes(
      snapshot.unionByName(delete).unionByName(recreate), base.schema)
    val ids = Sinks.applyChangeLog(log2, Seq("id"), Seq("ts_ms"))
      .select("id").as[Long].collect().sorted
    assert(ids === Array(1L, 2L, 3L))
  }

  test("range-join bands partition the price domain (each row exactly one band)") {
    val bands = Seq((0.0, 10.0, "low"), (10.0, 20.0, "mid"),
      (20.0, 1e9, "high")).toDF("lo", "hi", "band")
    val vals = (0 until 50).map(i => i.toDouble * 0.9).toDF("v")
    val joined = vals.join(broadcast(bands),
      col("v") >= col("lo") && col("v") < col("hi"))
    assert(joined.count() === 50)
    assert(joined.groupBy("v").count().where(col("count") =!= 1).count() === 0)
  }
}
