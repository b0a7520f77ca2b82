package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
        sentinelGaps = Seq(10L, 20L))))

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
         GROUP BY touch_type""")
}
