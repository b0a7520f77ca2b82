package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 wave: the tokenizer trains for real and the rank-
  * correlation pair completes.
  *
  *  - `e113_bpe_train` — ITERATIVE BPE merge training: N real merge
  *    rounds over the corpus word histogram, each round counting
  *    adjacent symbol pairs (one hash aggregate over the word-TYPE
  *    frame, weighted by corpus frequency), collecting the single
  *    winning pair (the model state — one row), and re-broadcasting
  *    it into the next round's symbol-merge projection. The
  *    `trainIvfCentroids` derive-then-apply cycle applied to the
  *    tokenizer itself (reference analog: the transform loop's
  *    derive-then-apply discipline, `etl.py:146-158`); extends the
  *    one-pass `e42_bpe_pairs` candidate scan to an actual trainer.
  *    At 100 TB the corpus is tokenized ONCE into the durable word
  *    histogram (the checkpoint a tokenizer-training pipeline
  *    persists); every merge round then runs on the type frame,
  *    whose cardinality is vocabulary-bounded, not corpus-bounded.
  *  - `e114_kendall` — Kendall's tau-b rank correlation per group,
  *    completing the rank-correlation pair with e106's Spearman:
  *    concordant/discordant pairs come from the JOINT (x, y) value
  *    histogram — domain-bounded cells (≤ |x|·|y| per group at ANY
  *    corpus size), so the pair enumeration is a self-join of a
  *    sub-thousand-row frame, never of rows. All sufficient
  *    statistics are exact integers (decimal-38 sums — the ×10
  *    overflow lesson); tau-b is ONE final double formula.
  */
object Surface22Queries {
  import Tables._

  /** Number of BPE merge rounds e113 trains (enough for the merge
    * table to leave the two-character regime and show real chaining
    * — merged symbols winning later rounds — while each round is one
    * type-frame aggregate).
    */
  val bpeIters = 8

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e113_bpe_train" -> ((s, dir) => {
      val rows = bpeMerges(s, dir, bpeIters).map {
        case (i, a, b, n) => (i, a, b, a + b, n)
      }
      import s.implicits._
      rows.toDF("merge_idx", "left_sym", "right_sym", "merged", "pair_n")
    }),

    "e114_kendall" -> ((s, dir) => {
      // joint value histogram: the ONLY corpus-sized pass; everything
      // after runs on ≤ |x|·|y| cells per group (550 here: 50
      // quantities × 11 discounts), invariant in the row count
      val h = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("g"), col("l_quantity").as("x"),
          col("l_discount").as("y"))
        .agg(count(lit(1)).as("n"))
      // each unordered cell pair once, oriented by strict x order;
      // y up = concordant, y down = discordant, y tie = neither
      val cd = h.as("a")
        .join(h.as("b"), col("a.g") === col("b.g") &&
          col("a.x") < col("b.x"))
        .groupBy(col("a.g").as("g"))
        .agg(
          sum(when(col("a.y") < col("b.y"),
            col("a.n").cast("decimal(38,0)") * col("b.n"))
            .otherwise(lit(0))).as("c"),
          sum(when(col("a.y") > col("b.y"),
            col("a.n").cast("decimal(38,0)") * col("b.n"))
            .otherwise(lit(0))).as("d"))
      // tie terms in DOUBLED form (t·(t−1), no /2 on the integer
      // side): n0p − n1p etc. stay exact integers; the halving rides
      // the final double formula where /2.0 is an exact FP step
      def tiePrime(key: String, out: String) =
        h.groupBy(col("g"), col(key)).agg(sum(col("n")).as("t"))
          .groupBy("g")
          .agg(sum(col("t").cast("decimal(38,0)") * (col("t") - 1))
            .as(out))
      val tx = tiePrime("x", "n1p")
      val ty = tiePrime("y", "n2p")
      val tot = h.groupBy("g").agg(sum(col("n")).as("nn"))
        .select(col("g"),
          (col("nn").cast("decimal(38,0)") * (col("nn") - 1)).as("n0p"))
      cd.join(tx, "g").join(ty, "g").join(tot, "g")
        .select(col("g").as("l_returnflag"),
          col("c").cast("long").as("concordant"),
          col("d").cast("long").as("discordant"),
          ((col("c") - col("d")).cast("double") /
            (sqrt((col("n0p") - col("n1p")).cast("double") / lit(2.0)) *
              sqrt((col("n0p") - col("n2p")).cast("double") / lit(2.0))))
            .as("tau_b"))
    }))

  // ---- e113: BPE merge trainer ----

  /** N BPE merge rounds over the corpus word histogram. Returns
    * (round, left, right, weighted pair count) per round.
    *
    * Symbol-state encoding: each word's current segmentation is a
    * DOUBLE-SPACE-joined string padded with two spaces at each end
    * ("␣␣a␣␣b␣␣…"), so applying merge (a,b) is ONE engine-native
    * `replace(s, "␣a␣␣b␣", "␣ab␣")`: the pattern anchors each symbol
    * with one space per side (no token-suffix false matches) while
    * consuming only the INNER half of every double separator, so
    * left-to-right non-overlapping replace — the semantics of both
    * Spark's and the oracle's `replace` — is exactly BPE's greedy
    * merge scan, chains included ("a a a" → "aa a", "a b a b" →
    * "ab ab"). Tokens are lowercase alphanumerics
    * (TextAnalysis.tokens), so the pattern literals need no escaping.
    *
    * Each round: one hash aggregate over the type frame (adjacent
    * pairs exploded, weighted by word frequency), TakeOrdered(1) with
    * the full (count desc, left, right) tie-break, a one-row collect
    * (the model), and a narrow projection applying the merge — the
    * broadcast-train cycle, with state that is a single winning pair
    * instead of a centroid matrix. The word histogram itself is
    * durably staged per (sf × fingerprint): at 100 TB the corpus is
    * tokenized once; training touches only word TYPES.
    */
  private def bpeMerges(s: SparkSession, dir: String, iters: Int)
      : Seq[(Long, String, String, Long)] = {
    val hist = Stage.durableFrame(s, "word-hist", dir) {
      tBalanced(s, dir, "documents")
        .select(explode(
          graft.operators.TextAnalysis.tokens(col("text"))).as("w"))
        .where(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("cnt"))
    }
    var state = hist.select(
      concat(lit("  "), array_join(
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))), "  "), lit("  ")).as("s"),
      col("cnt"))
    val out = Seq.newBuilder[(Long, String, String, Long)]
    for (k <- 1 to iters) {
      val top = state
        .select(col("cnt"), split(trim(col("s")), "  ").as("tk"))
        .select(col("cnt"), explode(arrays_zip(
          slice(col("tk"), lit(1), size(col("tk")) - 1).as("a"),
          slice(col("tk"), lit(2), size(col("tk")) - 1).as("b"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()(0)
      val (a, b, n) = (top.getString(0), top.getString(1), top.getLong(2))
      out += ((k.toLong, a, b, n))
      state = state.withColumn("s",
        replace(col("s"), lit(s" $a  $b "), lit(s" $a$b ")))
    }
    out.result()
  }

  // ---- oracles ----

  private val tokensSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** One oracle-side BPE round: pair counts from the previous state,
    * the winning pair by the same (n desc, a, b) order, and the
    * replace-applied next state — a SQL transcription of one
    * [[bpeMerges]] iteration.
    */
  private def bpeIterCte(i: Int): String =
    s"""pc$i AS (
         SELECT tk[CAST(j AS INT)] AS a, tk[CAST(j AS INT) + 1] AS b,
           SUM(cnt) AS n
         FROM (SELECT tk, cnt, unnest(range(1, len(tk))) AS j
               FROM (SELECT str_split(trim(s, ' '), '  ') AS tk, cnt
                     FROM st${i - 1}))
         GROUP BY 1, 2),
       top$i AS (SELECT a, b, n FROM pc$i ORDER BY n DESC, a, b LIMIT 1),
       st$i AS (SELECT replace(s, ' ' || t.a || '  ' || t.b || ' ',
           ' ' || t.a || t.b || ' ') AS s, cnt
         FROM st${i - 1}, top$i t)"""

  private def bpeOracle: String = {
    val iters = (1 to bpeIters).map(bpeIterCte).mkString(",\n       ")
    val rows = (1 to bpeIters).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS merge_idx, a AS left_sym,
            b AS right_sym, a || b AS merged, CAST(n AS BIGINT) AS pair_n
          FROM top$i"""
    }.mkString("\n          UNION ALL ")
    s"""WITH w AS (
         SELECT tk AS word, count(*) AS cnt
         FROM (SELECT unnest($tokensSql) AS tk FROM documents)
         WHERE len(tk) >= 2 GROUP BY tk),
       st0 AS (
         SELECT '  ' || array_to_string(list_transform(
             range(1, len(word) + 1),
             i -> substr(word, CAST(i AS INT), 1)), '  ') || '  ' AS s,
           cnt
         FROM w),
       $iters
       $rows"""
  }

  val oracles: Map[String, String] = Map(
    "e113_bpe_train" -> bpeOracle,

    // tau-b from the joint histogram: HUGEINT pair sums (DuckDB
    // SUM(BIGINT) is HUGEINT anyway — judged integers re-narrowed to
    // BIGINT per the dtype discipline), doubled tie terms, one final
    // double formula shared verbatim with the Spark side.
    "e114_kendall" ->
      """WITH h AS (
           SELECT l_returnflag AS g, l_quantity AS x, l_discount AS y,
             count(*) AS n
           FROM lineitem GROUP BY 1, 2, 3),
         cd AS (
           SELECT a.g,
             SUM(CASE WHEN a.y < b.y
               THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS c,
             SUM(CASE WHEN a.y > b.y
               THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS d
           FROM h a JOIN h b ON a.g = b.g AND a.x < b.x
           GROUP BY a.g),
         tx AS (SELECT g, SUM(CAST(t AS HUGEINT) * (t - 1)) AS n1p
           FROM (SELECT g, x, SUM(n) AS t FROM h GROUP BY g, x)
           GROUP BY g),
         ty AS (SELECT g, SUM(CAST(t AS HUGEINT) * (t - 1)) AS n2p
           FROM (SELECT g, y, SUM(n) AS t FROM h GROUP BY g, y)
           GROUP BY g),
         tot AS (SELECT g, CAST(SUM(n) AS HUGEINT) * (SUM(n) - 1) AS n0p
           FROM h GROUP BY g)
         SELECT g AS l_returnflag,
           CAST(c AS BIGINT) AS concordant,
           CAST(d AS BIGINT) AS discordant,
           CAST(c - d AS DOUBLE) /
             (sqrt(CAST(n0p - n1p AS DOUBLE) / 2.0) *
              sqrt(CAST(n0p - n2p AS DOUBLE) / 2.0)) AS tau_b
         FROM cd JOIN tx USING (g) JOIN ty USING (g) JOIN tot USING (g)""")
}
