package graft

/** Invariants for the round-17 wave (Surface27Queries): each judged
  * statistic recounted driver-side from first principles at sf0.001,
  * plus the c43 streaming twin's batch-equality gate.
  */
class Surface27Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def md5Hash(id: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(3).map("%02x".format(_)).mkString, 16)

  private def toks(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  test("c43 streaming twin equals the e163 batch guardrail panel") {
    val batch = SparkEntry.queries("e163_ab_guardrails")(spark, dir)
      .collect().toSeq
    val stream = SparkEntry.queries("c43_stream_guardrails")(spark, dir)
      .collect().toSeq
    assert(stream == batch)
  }

  test("e165: nested-sample growth panel matches a driver recount") {
    val row = SparkEntry.queries("e165_heaps_growth")(spark, dir).head()
    val docs = graft.queries.Tables.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def lvl(p: Long => Boolean) = {
      val sel = docs.filter(d => p(md5Hash(d._1)))
      val ts = sel.flatMap(d => toks(d._2))
      (sel.length.toLong, ts.length.toLong, ts.distinct.length.toLong)
    }
    val (d25, w25, v25) = lvl(_ % 4 == 0)
    val (d50, w50, v50) = lvl(_ % 2 == 0)
    val (d100, w100, v100) = lvl(_ => true)
    assert((row.getAs[Long]("docs_25"), row.getAs[Long]("words_25"),
      row.getAs[Long]("vocab_25")) == ((d25, w25, v25)))
    assert((row.getAs[Long]("docs_50"), row.getAs[Long]("words_50"),
      row.getAs[Long]("vocab_50")) == ((d50, w50, v50)))
    assert((row.getAs[Long]("docs_100"), row.getAs[Long]("words_100"),
      row.getAs[Long]("vocab_100")) == ((d100, w100, v100)))
    // nesting: each level's panel is bounded by the next
    assert(d25 <= d50 && d50 <= d100)
    assert(v25 <= v50 && v50 <= v100)
    // the sample is a genuine slice, not empty or everything
    assert(d25 > 0 && d25 < d100)
  }

  test("e166: exact quantiles match a driver sort; bounds hold") {
    val out = SparkEntry.queries("e166_quantile_audit")(spark, dir)
      .collect()
    val vals = graft.queries.Tables.t(spark, dir, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val xs = vals(r.getAs[String]("l_returnflag"))
      val n = xs.length
      assert(r.getAs[Long]("n") == n.toLong)
      assert(r.getAs[Double]("exact_p50") == xs(((n + 1) / 2) - 1))
      assert(r.getAs[Double]("exact_p90") ==
        xs((1 + ((n - 1) * 9) / 10) - 1))
      assert(r.getAs[Boolean]("p50_in_bound"))
      assert(r.getAs[Boolean]("p90_in_bound"))
    }
  }

  test("e168: count-min estimates match an exact driver-built sketch") {
    val out = SparkEntry.queries("e168_countmin")(spark, dir).collect()
    val counts = graft.queries.Tables.t(spark, dir, "documents")
      .select("text").collect().flatMap(r => toks(r.getString(0)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def bucket(j: Int, tok: String): Long = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cm$j|$tok".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hx, 16) % 64L
    }
    val cells = scala.collection.mutable.Map[(Int, Long), Long]()
      .withDefaultValue(0L)
    counts.foreach { case (tok, c) =>
      (0 until 4).foreach(j => cells((j, bucket(j, tok))) += c)
    }
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20).toMap
    assert(out.length == 20)
    out.foreach { r =>
      val tok = r.getAs[String]("tok")
      val est = (0 until 4).map(j => cells((j, bucket(j, tok)))).min
      assert(r.getAs[Long]("true_cnt") == top(tok))
      assert(r.getAs[Long]("est_cnt") == est)
      assert(r.getAs[Long]("overcount") == est - top(tok))
      // the one-sided Count-Min guarantee
      assert(est >= top(tok))
    }
  }

  test("e167: int8 quantization census matches a driver recount") {
    val row = SparkEntry.queries("e167_int8_quant")(spark, dir).head()
    val vecs = graft.queries.Tables.t(spark, dir, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0))
    var sse = 0L; var sat = 0L; var elems = 0L
    vecs.foreach { v =>
      val mx = v.map(x => math.abs(x.toDouble)).max
      elems += v.length
      if (mx > 0) {
        val s = mx / 127.0
        v.foreach { xf =>
          val x = xf.toDouble
          val q = math.max(-127.0, math.min(127.0,
            math.floor(x / s + 0.5)))
          val err = x - q * s
          sse += math.floor(err * err * 1e14).toLong
          if (math.abs(q) == 127.0) sat += 1L
        }
      }
    }
    assert(row.getAs[Long]("n_vecs") == vecs.length.toLong)
    assert(row.getAs[Long]("n_elems") == elems)
    assert(row.getAs[Long]("sse_fp") == sse)
    assert(row.getAs[Long]("n_saturated") == sat)
    assert(math.abs(row.getAs[Double]("mse") -
      BigDecimal(sse / 1e14 / elems)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-15)
    // every vector saturates at least its max element (q = ±127 there)
    assert(sat >= vecs.length)
  }
}
