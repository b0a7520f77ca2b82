package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 wave: attribution hardened for production (state TTL,
  * multi-touch models) and trained ANN centroids.
  *
  *  - `c33_stream_attribution_ttl` — windowed last-touch attribution
  *    per (user, campaign) entity with `EventTimeTimeout` state
  *    eviction, judged END TO END: purchases credit only in-window
  *    touches, and the state store's lifecycle is part of the output —
  *    every eviction emits an `(evicted)` audit row when the entity
  *    went stale mid-stream and `(live_end)` at the final drain, so
  *    `(evicted)`+`(live_end)` partitions the touched-entity
  *    population and the oracle checks the exact state count. The
  *    window (2·step+1 µs, step = span/3+1) is chosen ≥ 2 chunk spans
  *    so evictions can only fire at the sentinel batches — making the
  *    timing deterministic under the 3-chunk feed — while still
  *    evicting every entity whose last touch is in the feed's first
  *    chunk (178 / 1 682 / 17 220 entities at sf 0.001/0.01/0.1).
  *    Timeout semantics are ms-floored strict `<` on both sides
  *    (`graft.streaming.Attribution.attributeWindowed`).
  */
object Surface20Queries {
  import Tables._

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c33_stream_attribution_ttl" -> ((s, dir) =>
      EventFeed.windowedAttributionRollup(s, dir, "graft-c33-",
        perCampaign = true,
        windowOf = (lo, hi) => 2 * ((hi - lo) / 3 + 1) + 1,
        sentinelGaps = Seq(10L, 20L))),

    // Position-based (U-shaped 40/40/20) multi-touch attribution,
    // batch form: per purchase, ONE window pass over the user's prior
    // events yields the touch count, first/last/second-last touch
    // types, and per-channel counts (all over the SAME window spec —
    // one exchange on user_id, one sort); the credit split is then a
    // codegen'd projection in exact integer µ-shares (see
    // Attribution.creditShares for the remainder-to-last-middle rule
    // that keeps each purchase's shares summing to exactly 1e6 µ).
    // The rollup sums integers and performs the ONLY double division
    // at report time — engine-reproducible, order-independent. At
    // 100 TB: the window sort is per-user-partition local after one
    // hash exchange; the exploded credit frame is ≤ 5 rows per
    // purchase; the report aggregate is a 5-row frame.
    "q110_multitouch" -> ((s, dir) => {
      val types = graft.streaming.Attribution.touchTypes
      val w1 = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      val base = events(s, dir)
        .withColumn("__touch", touch)
        .withColumn("__pt", when(touch.isNotNull,
          last(touch, ignoreNulls = true).over(w1)))
      val cntCols = types.map(t =>
        count(when(col("__touch") === t, 1)).over(w1).as(s"cnt_$t"))
      val enriched = base.select(
        (Seq(col("event_type"), col("value"),
          count(col("__touch")).over(w1).as("n"),
          first(col("__touch"), ignoreNulls = true).over(w1).as("ft"),
          last(col("__touch"), ignoreNulls = true).over(w1).as("lt"),
          last(col("__pt"), ignoreNulls = true).over(w1).as("slt"))
          ++ cntCols): _*)
      val p = enriched.where(col("event_type") === "purchase")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("b", when(col("n") >= 3,
          floor(lit(200000L) / (col("n") - 2)).cast("long"))
          .otherwise(lit(0L)))
      def isT(c: String, t: String) =
        when(col(c) === t, 1L).otherwise(0L)
      def credit(t: String) =
        when(col("n") === 0, lit(0L))
          .when(col("n") === 1, isT("ft", t) * 1000000L)
          .when(col("n") === 2,
            isT("ft", t) * 500000L + isT("lt", t) * 500000L)
          .otherwise(isT("ft", t) * 400000L + isT("lt", t) * 400000L +
            (col(s"cnt_$t") - isT("ft", t) - isT("lt", t)) * col("b") +
            isT("slt", t) * (lit(200000L) - col("b") * (col("n") - 2)))
      val shares = types.map(t => struct(lit(t).as("t"),
        credit(t).as("w"))) :+
        struct(lit("(none)").as("t"),
          when(col("n") === 0, 1000000L).otherwise(0L).as("w"))
      p.select(col("cents"), explode(array(shares: _*)).as("c"))
        .select(col("c.t").as("touch_type"), col("c.w").as("w"),
          (col("c.w") * col("cents")).as("mc"))
        .where(col("w") > 0)
        .groupBy("touch_type")
        .agg((sum(col("w")).cast("double") / lit(1000000.0))
            .as("conversions"),
          (sum(col("mc")).cast("double") / lit(100000000.0))
            .as("attributed_value"))
    }),

    // The STREAMING twin of q110 against the SAME oracle: per-user
    // bounded MTState (first/last/second-last + per-channel counts)
    // through the real micro-batch engine; each purchase emits its
    // exact-integer µ-shares as it arrives, and the rollup is
    // identical to the batch report.
    "c34_stream_multitouch" -> ((s, dir) =>
      EventFeed.multiTouchRollup(s, dir, "graft-c34-")))

  val oracles: Map[String, String] = Map(
    // The streaming result is fully determined by event-time
    // semantics: per-(user,k) windowed last-touch credit on purchases,
    // plus one audit row per touched entity — `(evicted)` iff the
    // entity's LAST touch times out against the end-of-data watermark
    // (ms-floored strict <, exactly Spark's InputProcessor condition),
    // else `(live_end)` from the drain sentinel.
    "c33_stream_attribution_ttl" ->
      """WITH ev AS (
           SELECT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             event_id, epoch_us(ts) AS ts_us, event_type, value
           FROM events),
         b AS (SELECT max(ts_us) AS hi,
             2 * ((max(ts_us) - min(ts_us)) // 3 + 1) + 1 AS w FROM ev),
         touched AS (
           SELECT event_type, value, ts_us,
             last_value(CASE WHEN event_type <> 'purchase'
                 THEN event_type END IGNORE NULLS) OVER wnd AS lt_type,
             last_value(CASE WHEN event_type <> 'purchase'
                 THEN ts_us END IGNORE NULLS) OVER wnd AS lt_ts
           FROM ev
           WINDOW wnd AS (PARTITION BY user_id, k ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         purch AS (
           SELECT CASE WHEN lt_type IS NOT NULL
               AND lt_ts > ts_us - (SELECT w FROM b)
               THEN lt_type ELSE '(none)' END AS touch_type, value
           FROM touched WHERE event_type = 'purchase'),
         st AS (SELECT user_id, k, max(ts_us) AS t FROM ev
           WHERE event_type <> 'purchase' GROUP BY user_id, k),
         audit AS (
           SELECT CASE WHEN (t + (SELECT w FROM b)) // 1000
                 < (SELECT hi FROM b) // 1000
               THEN '(evicted)' ELSE '(live_end)' END AS touch_type,
             CAST(0 AS DOUBLE) AS value
           FROM st)
         SELECT touch_type, count(*) AS conversions,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,2))) AS VARCHAR)
             AS DOUBLE) AS attributed_value
         FROM (SELECT * FROM purch UNION ALL SELECT * FROM audit)
         GROUP BY touch_type""",

    "q110_multitouch" -> multiTouchOracle,
    "c34_stream_multitouch" -> multiTouchOracle)

  /** U-shaped 40/40/20 multi-touch in exact integer µ-shares — the
    * single oracle for the batch q110 window query AND the streaming
    * c34 state walk (stream/batch parity). Integer division `//` with
    * remainder-to-second-last mirrors Attribution.creditShares; the
    * only doubles are the two report-time divisions.
    */
  private def multiTouchOracle: String =
    """WITH ev AS (
         SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
           value,
           CASE WHEN event_type <> 'purchase' THEN event_type END AS touch
         FROM events),
       t1 AS (
         SELECT *, CASE WHEN touch IS NOT NULL THEN
             last_value(touch IGNORE NULLS) OVER wnd END AS pt
         FROM ev
         WINDOW wnd AS (PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       t2 AS (
         SELECT event_type, value,
           count(touch) OVER wnd AS n,
           first_value(touch IGNORE NULLS) OVER wnd AS ft,
           last_value(touch IGNORE NULLS) OVER wnd AS lt,
           last_value(pt IGNORE NULLS) OVER wnd AS slt,
           count(CASE WHEN touch = 'click' THEN 1 END) OVER wnd AS cnt_click,
           count(CASE WHEN touch = 'view' THEN 1 END) OVER wnd AS cnt_view,
           count(CASE WHEN touch = 'signup' THEN 1 END) OVER wnd AS cnt_signup,
           count(CASE WHEN touch = 'error' THEN 1 END) OVER wnd AS cnt_error
         FROM t1
         WINDOW wnd AS (PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       p AS (
         SELECT CAST(round(value * 100) AS BIGINT) AS cents, n, ft, lt,
           slt, cnt_click, cnt_view, cnt_signup, cnt_error,
           CASE WHEN n >= 3 THEN 200000 // (n - 2) ELSE 0 END AS b
         FROM t2 WHERE event_type = 'purchase'),
       cr AS (
         SELECT ty.t AS touch_type, p.cents,
           CASE
             WHEN p.n = 0 THEN
               CASE WHEN ty.t = '(none)' THEN 1000000 ELSE 0 END
             WHEN ty.t = '(none)' THEN 0
             WHEN p.n = 1 THEN
               CASE WHEN p.ft = ty.t THEN 1000000 ELSE 0 END
             WHEN p.n = 2 THEN
               500000 * (CASE WHEN p.ft = ty.t THEN 1 ELSE 0 END) +
               500000 * (CASE WHEN p.lt = ty.t THEN 1 ELSE 0 END)
             ELSE
               400000 * (CASE WHEN p.ft = ty.t THEN 1 ELSE 0 END) +
               400000 * (CASE WHEN p.lt = ty.t THEN 1 ELSE 0 END) +
               (CASE ty.t WHEN 'click' THEN p.cnt_click
                 WHEN 'view' THEN p.cnt_view
                 WHEN 'signup' THEN p.cnt_signup
                 ELSE p.cnt_error END
                - (CASE WHEN p.ft = ty.t THEN 1 ELSE 0 END)
                - (CASE WHEN p.lt = ty.t THEN 1 ELSE 0 END)) * p.b +
               (CASE WHEN p.slt = ty.t THEN 1 ELSE 0 END) *
                 (200000 - p.b * (p.n - 2))
           END AS w
         FROM p, (VALUES ('click'), ('view'), ('signup'), ('error'),
           ('(none)')) AS ty(t))
       SELECT touch_type,
         CAST(SUM(w) AS DOUBLE) / 1000000.0 AS conversions,
         CAST(SUM(w * cents) AS DOUBLE) / 100000000.0 AS attributed_value
       FROM cr WHERE w > 0
       GROUP BY touch_type"""
}
