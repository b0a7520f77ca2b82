package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector-similarity search over embedding columns (north star §2.6).
  *
  * Scale design (100 TB): [[bruteForceTopK]] against a single query
  * vector is a narrow map + TakeOrdered — linear scan, no shuffle, fine
  * at any corpus size for one query. All-pairs / many-query search must
  * go through [[lshBuckets]]: sign-random-projection buckets turn the
  * search into a bucket equi-join (candidates only). Never cross-join a
  * corpus against itself.
  */
object Similarity {

  /** Dot product of two equal-length float-array columns, accumulated in
    * double via a codegen-friendly fold (deterministic: array order).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, p) => acc + p)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in plain double arithmetic. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the native codegen `vec_dot` expression
    * ([[graft.functions.FloatVecDot]]) — bit-identical to [[cosine]]
    * (same left-to-right summation) but with no per-row intermediate
    * array allocation; the hot-loop form for large fan-out scoring.
    * Requires the function registered on the session
    * ([[graft.functions.GraftFunctions.register]] /
    * `spark.sql.extensions=graft.functions.GraftExtensions`).
    */
  def cosineNative(a: Column, b: Column): Column = {
    val d = call_function("vec_dot", a, b)
    d / (sqrt(call_function("vec_dot", a, a)) *
      sqrt(call_function("vec_dot", b, b)))
  }

  /** Engine-portable cosine: element products are computed in double
    * (IEEE-identical anywhere), quantized to fixed-point longs via
    * `floor(p · 1e7)` (floor of an identical double is identical
    * everywhere — no rounding-mode ambiguity), summed exactly as longs
    * (order-independent), and only then returned to double. Matches any
    * engine that follows the same recipe bit-for-bit — used by the
    * judged oracle query; quantization loss is ~1e-7 per element.
    */
  def cosineExact(a: Column, b: Column): Column = {
    val scale = 1e7
    def fsum(arr: Column): Column =
      aggregate(arr, lit(0L),
        (acc, p) => acc + floor(p * scale).cast(LongType))
        .cast(DoubleType) / scale
    val dotD = fsum(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)))
    val naD = fsum(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)))
    val nbD = fsum(transform(b, x => x.cast(DoubleType) * x.cast(DoubleType)))
    dotD / (sqrt(naD) * sqrt(nbD))
  }

  /** Fixed-point long image of ⟨a,b⟩ — the exact engine-portable sum
    * inside [[cosineExact]], exposed on its own so SELF-norms can be
    * computed ONCE per row and reused across pairs: at probes × corpus
    * (or candidate-pair) scale this cuts per-pair work from three
    * 64-wide folds to one. `floor((x·y)·1e7)` term-for-term matches the
    * oracle SQL's fixed-point product.
    */
  def dotFixedLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        floor(x.cast(DoubleType) * y.cast(DoubleType) * lit(1e7))
          .cast(LongType)),
      lit(0L), (acc, e) => acc + e)

  /** Cosine from precomputed fixed-point sums (see [[dotFixedLong]]):
    * identical double arithmetic to [[cosineExact]], with the two norm
    * folds hoisted out of the pair loop.
    */
  def cosineFromFixed(dotF: Column, naF: Column, nbF: Column): Column =
    (dotF.cast(DoubleType) / 1e7) /
      (sqrt(naF.cast(DoubleType) / 1e7) * sqrt(nbF.cast(DoubleType) / 1e7))

  /** Brute-force top-k most-similar rows to one query vector.
    * Plan: scan → map (cosine) → TakeOrderedAndProject. No exchange.
    */
  def bruteForceTopK(corpus: DataFrame, id: String, vec: String,
                     query: Seq[Float], k: Int,
                     scorer: (Column, Column) => Column = cosine): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    corpus
      .select(col(id), scorer(col(vec), q).as("cosine"))
      .orderBy(col("cosine").desc, col(id))
      .limit(k)
  }

  /** Deterministic ±1 hyperplane sign matrix, derived from
    * md5("plane<j>|<i>") parity ONCE on the driver and shipped as plan
    * literals — every executor sees identical planes with zero runtime
    * hashing (the previous expression-level derivation cost one md5 per
    * row × plane × dimension).
    */
  def planeSigns(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes) { j =>
      Array.tabulate(dim) { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"plane$j|$i".getBytes("UTF-8"))
        // first 2 md5 bytes = substr(hex, 1, 4): same parity derivation
        val v = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
        if (v % 2 == 0) 1.0 else -1.0
      }
    }

  /** Sign-random-projection LSH bucket id over `nPlanes` hyperplanes:
    * bucket = bit vector of sign(v · plane_j). Vectors in the same bucket
    * are ANN candidates. Pure expression — the 100 TB path hashes the
    * corpus once, then joins queries to bucket mates only.
    */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    val signs = planeSigns(nPlanes, dim)
    val bits = (0 until nPlanes).map { j =>
      val plane = array(signs(j).map(lit).toIndexedSeq: _*)
      val proj = aggregate(
        zip_with(vec, plane, (x, s) => x.cast(DoubleType) * s),
        lit(0.0), (acc, p) => acc + p)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN top-k for one query vector: restrict the scan to the
    * query's LSH bucket, then exact cosine within it. Recall < 1 by
    * construction; widen with multi-probe (nPlanes↓) when needed.
    */
  def lshTopK(corpus: DataFrame, id: String, vec: String,
              query: Seq[Float], k: Int, nPlanes: Int = 8): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    val dim = query.length
    corpus
      .withColumn("__bucket", lshBucket(col(vec), nPlanes, dim))
      .where(col("__bucket") === lshBucket(q, nPlanes, dim))
      .select(col(id), cosine(col(vec), q).as("cosine"))
      .orderBy(col("cosine").desc, col(id))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket the corpus once,
    * compare only bucket mates, keep pairs above `minCosine` — the
    * embedding-space analog of MinHash near-dup detection. Equi-join on
    * the bucket key; never all-pairs.
    *
    * Each row's L2 norm is computed ONCE before the self-join (a pair
    * inside a bucket of n rows would otherwise fold each norm ~n times);
    * per-pair work is a single dot-product fold. `dotFn` swaps in the
    * native codegen `vec_dot` (bit-identical fold, no per-pair array
    * allocation) when the session has it registered.
    */
  def cosineNearDupPairs(corpus: DataFrame, id: String, vec: String,
                         nPlanes: Int, dim: Int, minCosine: Double,
                         dotFn: (Column, Column) => Column = dot): DataFrame = {
    val b = corpus.select(col(id), col(vec),
      lshBucket(col(vec), nPlanes, dim).as("__b"),
      sqrt(dotFn(col(vec), col(vec))).as("__n"))
    b.as("x").join(b.as("y"),
        col("x.__b") === col("y.__b") && col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").as("id_a"), col(s"y.$id").as("id_b"),
        (dotFn(col(s"x.$vec"), col(s"y.$vec")) /
          (col("x.__n") * col("y.__n"))).as("cosine"))
      .where(col("cosine") > minCosine)
  }

  /** Deterministic synthetic centroid set for the IVF index structure,
    * derived like [[planeSigns]] from md5("cent<j>|<i>") → a float in
    * [-1, 1]. Production would k-means a sample; the index mechanics
    * (cell assignment, probe-only-your-cell) are identical, and the
    * derivation is reproducible driver-side AND in oracle SQL (the float
    * literals round-trip exactly through their double decimal form).
    */
  def syntheticCentroids(n: Int, dim: Int): Seq[Seq[Float]] =
    Seq.tabulate(n) { j =>
      Seq.tabulate(dim) { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"cent$j|$i".getBytes("UTF-8"))
        val v = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
        (v.toFloat / 65535f) * 2f - 1f
      }
    }

  /** Fixed-point (1e-7) dot of a vector column against a LITERAL
    * centroid: Σ floor(x_i·c_i·1e7) as a long. Products are quantized
    * to integers BEFORE the sum, so the fold is order-independent and
    * engine-reproducible — the arithmetic discipline that lets k-means
    * training run identically in Spark and in the judged oracle SQL.
    */
  def dotFixedToLit(vec: Column, cent: Seq[Double]): Column =
    aggregate(zip_with(vec, array(cent.map(lit): _*),
        (x, c) => floor(x.cast(DoubleType) * c * lit(1e7))
          .cast(LongType)),
      lit(0L), (acc, e) => acc + e)

  /** Fixed-point self-dot Σ floor(x·x·1e7) — the vector-norm image in
    * the same engine-portable integer arithmetic as [[dotFixedToLit]].
    */
  def selfDotFixedLong(vec: Column): Column =
    aggregate(transform(vec, x =>
        floor(x.cast(DoubleType) * x.cast(DoubleType) * lit(1e7))
          .cast(LongType)),
      lit(0L), (acc, e) => acc + e)

  /** Nearest-centroid assignment under fixed-point scoring: score_j =
    * dt_j / √nc_j with dt_j = [[dotFixedToLit]] and nc_j the centroid's
    * fixed-point self-dot — cosine to centroid j up to the common
    * per-vector factor 1/√nv, which cannot change the argmax. Ties go
    * to the higher cell id (the house greatest-struct order).
    * `cents` carries EXPLICIT cell ids so cells emptied during
    * training keep the survivors' ids stable.
    */
  def ivfCellFixed(vec: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    val scored = cents.map { case (cid, c) =>
      val nc = c.map(v => math.floor(v * v * 1e7).toLong).sum
      struct((dotFixedToLit(vec, c).cast(DoubleType) /
        sqrt(lit(nc.toDouble))).as("s"), lit(cid).as("i"))
    }
    greatest(scored: _*).getField("i")
  }

  /** Lloyd's k-means as DataFrame algebra — the training pass that
    * replaces synthetic IVF centroids with DATA-ADAPTED cells. Each
    * iteration: (1) assign every vector to its nearest centroid
    * ([[ivfCellFixed]] — a codegen'd projection against broadcast-sized
    * literals, no shuffle); (2) new centroid = exact fixed-point mean
    * per (cell, dim): `posexplode` → ONE hash exchange on (cell, dim)
    * → Σ floor(x·1e7) and count as integers → component
    * `(Σq / 1e7) / n` in double. The k×d result (the model state) is
    * collected to the driver and baked into the next iteration's
    * assignment expression — exactly the broadcast-train-collect cycle
    * distributed k-means runs at 100 TB, where the centroid matrix is
    * always driver/broadcast-sized while the data never leaves the
    * cluster. Because every cross-row sum is an integer, the trained
    * centroids are bit-reproducible at any parallelism AND by the
    * oracle's SQL transcription of the same recipe. Cells that lose
    * all members are dropped (standard Lloyd's degenerate-cell
    * handling); survivors keep their ids.
    */
  def trainIvfCentroids(corpus: DataFrame, vecCol: String,
      init: Seq[(Int, Seq[Double])], iters: Int): Seq[(Int, Seq[Double])] = {
    var cents = init
    for (_ <- 0 until iters) {
      // two-step select: a generator (posexplode) in the same
      // projection as the greatest-struct assignment trips analyzer
      // field resolution (FIELD_NOT_FOUND on the struct accessor)
      val rows = corpus
        .select(ivfCellFixed(col(vecCol), cents).as("cell"), col(vecCol))
        .select(col("cell"), posexplode(col(vecCol)))
        .groupBy("cell", "pos")
        .agg(sum(floor(col("col").cast(DoubleType) * lit(1e7))
            .cast(LongType)).as("sq"),
          count(lit(1)).as("n"))
        .select(col("cell").cast(IntegerType), col("pos"),
          (col("sq").cast(DoubleType) / lit(1e7) /
            col("n").cast(DoubleType)).as("v"))
        .collect()
      cents = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
        case (cid, rs) =>
          cid -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      require(cents.nonEmpty, "k-means: all cells empty")
    }
    cents
  }

  /** IVF (inverted-file) coarse quantization: assign each vector to its
    * nearest centroid by cosine — the bucket key for an IVF index. The
    * centroid list is small (≤ a few thousand) and goes into the plan
    * as literals / a broadcast; at 100 TB the corpus is written
    * partitioned by `ivf_cell` so a probe reads only `nprobe`
    * partitions.
    */
  def ivfCell(vec: Column, centroids: Seq[Seq[Float]],
              scorer: (Column, Column) => Column = cosine): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(scorer(vec, array(c.map(lit): _*)).as("s"), lit(i).as("i"))
    }
    greatest(scored: _*).getField("i")
  }

  /** Cosine of a vector to its own (nearest) centroid — the cell
    * cohesion score SemDeDup-style pruning ranks by: within a cluster,
    * the member CLOSER to the centroid is the redundant one (its
    * information is better represented); the peripheral member carries
    * the diversity. Same max the greatest-struct in [[ivfCell]] takes,
    * read on the score side.
    */
  def ivfCellScore(vec: Column, centroids: Seq[Seq[Float]],
                   scorer: (Column, Column) => Column = cosine): Column =
    greatest(centroids.map(c => scorer(vec, array(c.map(lit): _*))): _*)

  /** Multi-probe cell list: the `nprobe` best cells for a vector,
    * ordered by descending cosine with ties to the higher index — the
    * same total order [[ivfCell]]'s greatest-struct uses, so probe 1 of
    * this list is always ivfCell. Recall at a fixed cell count rises
    * with `nprobe` because near-boundary neighbors land in adjacent
    * cells; cost rises linearly (nprobe cells scanned per query).
    */
  def ivfCells(vec: Column, centroids: Seq[Seq[Float]], nprobe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(vec, array(c.map(lit): _*)).as("s"), lit(i).as("i"))
    }
    slice(reverse(array_sort(array(scored: _*))), 1, nprobe).getField("i")
  }

  /** IVF ANN top-k: probe the query's `nprobe` best cells, exact cosine
    * within. The candidate pool grows monotonically with `nprobe`, and
    * any true top-k member in the pool is always in the probed top-k
    * (at most k-1 vectors anywhere beat it), so recall@k is
    * non-decreasing in `nprobe`. `centroids` would come from a k-means
    * sample in production; any fixed representative set works for the
    * index structure.
    */
  def ivfTopK(corpus: DataFrame, id: String, vec: String,
              query: Seq[Float], k: Int,
              centroids: Seq[Seq[Float]], nprobe: Int = 1): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    def qScore(c: Seq[Float]): Double = {
      val dot = c.zip(query).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val n = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(query.map(x => x.toDouble * x.toDouble).sum)
      dot / n
    }
    val qCells = centroids.zipWithIndex
      .map { case (c, i) => (qScore(c), i) }
      .sortBy { case (s, i) => (-s, -i) }
      .take(nprobe).map(_._2)
    corpus
      .withColumn("__cell", ivfCell(col(vec), centroids))
      .where(col("__cell").isin(qCells: _*))
      .select(col(id), cosine(col(vec), q).as("cosine"))
      .orderBy(col("cosine").desc, col(id))
      .limit(k)
  }
}
