package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Quantiles, Rank}

/** The scalable order-statistic / global-rank operators must agree
  * exactly with the naive single-window forms they replace — on data
  * with duplicates, nulls, skewed groups, and group counts hitting
  * every rank edge case (n = 1, n < 4, exact-quarter n).
  */
class QuantilesRankSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows: (group ∈ 3 skewed values, value)
  private def rows(n: Int): Seq[(String, Long)] =
    (1 to n).map { i =>
      val h = Integer.toUnsignedLong(scala.util.hashing.MurmurHash3
        .stringHash(s"qr$i"))
      val g = if (h % 10 < 6) "a" else if (h % 10 < 9) "b" else "c"
      (g, h % 97) // heavy duplication in values
    }

  test("orderStats median equals window-rank median per group") {
    for (n <- Seq(1, 2, 3, 7, 500)) {
      val df = rows(n).toDF("g", "v")
      val got = Quantiles.orderStats(df, Seq("g"), "v",
        Seq("med" -> Quantiles.medianRank _))
        .select("g", "med").as[(String, Long)].collect().toMap
      val w = Window.partitionBy("g").orderBy("v")
      val want = df
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("g")))
        .where(col("rn") === expr("(cnt + 1) div 2"))
        .select("g", "v").as[(String, Long)].collect().toMap
      assert(got === want, s"n=$n")
    }
  }

  test("orderStats interpolated quartiles equal percentile() per group") {
    for (n <- Seq(1, 2, 3, 4, 5, 9, 400)) {
      val df = rows(n).toDF("g", "v")
      val st = Quantiles.orderStats(df, Seq("g"), "v",
        Seq[(String, Column => Column)](
          "lo" -> (c => Quantiles.loRank(c, 1, 4)),
          "hi" -> (c => Quantiles.hiRank(c, 1, 4))))
      val got = st.select(col("g"),
        (col("lo").cast("double") + Quantiles.fracAt(col("n_total"), 1, 4) *
          (col("hi").cast("double") - col("lo").cast("double"))).as("p25"))
        .as[(String, Double)].collect().toMap
      val want = df.groupBy("g").agg(expr("percentile(v, 0.25D)").as("p25"))
        .as[(String, Double)].collect().toMap
      assert(got === want, s"n=$n")
    }
  }

  test("rankSpans partitions [1, n] per group, in value order") {
    val df = rows(500).toDF("g", "v")
    val hist = df.groupBy("g", "v").agg(count(lit(1)).as("__n"))
    val spans = Quantiles.rankSpans(hist, Seq("g"), "v")
      .select(col("g"), col("v"), col("__n"), col("__lo"), col("__hi"),
        col("__cnt"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    val totals = rows(500).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    spans.foreach { case (g, rs) =>
      val sorted = rs.sortBy(_._2) // ascending value
      assert(sorted.forall(_._6 === totals(g)), s"group $g __cnt")
      assert(sorted.head._4 === 1L, s"group $g first lo")
      assert(sorted.last._5 === totals(g), s"group $g last hi")
      sorted.foreach { case (_, _, n, lo, hi, _) =>
        assert(hi - lo + 1 === n, s"group $g span width = count")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 === a._5 + 1,
          s"group $g spans contiguous in value order")
        case _ => ()
      }
    }
  }

  test("orderStats ignores nulls like SQL percentile") {
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(3L)),
      ("b", None), ("b", Some(5L))).toDF("g", "v")
    val got = Quantiles.orderStats(df, Seq("g"), "v",
      Seq("med" -> Quantiles.medianRank _))
      .select("g", "med", "n_total")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 2L), ("b", 5L, 1L)))
  }

  test("withGlobalRowNumber equals unpartitioned row_number") {
    for (n <- Seq(1, 5, 1000)) {
      val df = rows(n).zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id")
      val got = Rank.withGlobalRowNumber(df, Seq(col("v"), col("id")))
        .select("id", "rn", "n_total")
        .as[(Long, Long, Long)].collect().toSet
      val w = Window.orderBy(col("v"), col("id"))
      val want = df.select(col("id"),
        row_number().over(w).cast("long").as("rn"),
        lit(n.toLong).as("n_total"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want, s"n=$n")
    }
  }

  test("withGlobalRowNumberNarrow equals the wide form on a wide table") {
    val df = rows(500).zipWithIndex
      .map { case ((g, v), i) =>
        (g, v, i.toLong, s"payload-$i" * 3, i * 2.5) }
      .toDF("g", "v", "id", "wide1", "wide2")
    val narrow = Rank.withGlobalRowNumberNarrow(df, Seq("v", "id"),
      Seq("id")).select("id", "wide1", "rn", "n_total")
      .as[(Long, String, Long, Long)].collect().toSet
    val wide = Rank.withGlobalRowNumber(df, Seq(col("v"), col("id")))
      .select("id", "wide1", "rn", "n_total")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(narrow === wide)
  }

  test("ntileOf and cumeDistOf equal SQL ntile/cume_dist on unique keys") {
    for ((n, k) <- Seq((1, 4), (3, 4), (8, 4), (1000, 7))) {
      val df = rows(n).zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id")
      val ranked = Rank.withGlobalRowNumber(df, Seq(col("v"), col("id")))
      val got = ranked.select(col("id"),
        Rank.ntileOf(col("rn"), col("n_total"), k).as("t"),
        Rank.cumeDistOf(col("rn"), col("n_total")).as("cd"))
        .as[(Long, Long, Double)].collect().toSet
      val w = Window.orderBy(col("v"), col("id"))
      val want = df.select(col("id"),
        ntile(k).over(w).cast("long").as("t"),
        cume_dist().over(w).as("cd"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got === want, s"n=$n k=$k")
    }
  }
}
