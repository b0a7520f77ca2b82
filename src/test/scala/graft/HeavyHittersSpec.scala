package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** A skewed corpus: key "hot" is 40%, "warm" 20%, the rest spread
    * over 40 cold keys (1.0% each).
    */
  private def corpus(parts: Int) = {
    val rows =
      List.fill(400)("hot") ++ List.fill(200)("warm") ++
        (0 until 400).map(i => s"cold${i % 40}")
    rows.toDF("k").repartition(parts)
  }

  test("MG candidates are a superset of true heavy hitters at any partitioning") {
    for (parts <- Seq(1, 2, 7)) {
      // k=4 → guarantee covers fraction > 1/5 = 20%: "hot" must survive
      val cand = HeavyHitters.candidates(corpus(parts), col("k"), 4)
        .as[String].collect().toSet
      assert(cand.contains("hot"), s"parts=$parts candidates=$cand")
    }
  }

  test("exact heavy hitters match a plain groupBy under every partitioning") {
    val df = corpus(5)
    val expected = df.groupBy("k").count()
      .where(col("count") * 5 > lit(1000L))
      .as[(String, Long)].collect().toSet
    for (parts <- Seq(1, 3, 8)) {
      val got = HeavyHitters.exactHeavyHitters(corpus(parts), col("k"), 4)
        .as[(String, Long)].collect().toSet
      assert(got == expected, s"parts=$parts got=$got expected=$expected")
    }
  }

  test("no heavy hitters on a uniform corpus; empty input yields empty") {
    val uniform = (0 until 1000).map(i => s"k${i % 100}").toDF("k")
    // threshold 1/11 ≈ 9.1%; every key holds 1%
    assert(HeavyHitters.exactHeavyHitters(uniform, col("k"), 10).count() == 0)
    val empty = Seq.empty[String].toDF("k")
    assert(HeavyHitters.exactHeavyHitters(empty, col("k"), 10).count() == 0)
  }

  test("sketch per partition stays within k counters") {
    // cardinality 200 over one partition, k=8 → candidate set ≤ 8
    val oneK = (0 until 1000).map(i => s"u${i % 200}").toDF("k").coalesce(1)
    assert(HeavyHitters.candidates(oneK, col("k"), 8).count() <= 8)
  }
}
