package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 third wave: behavioral attribution and corpus-concentration
  * reporting.
  *
  *  - `q109_attribution` — last-touch attribution: every purchase is
  *    credited to the latest strictly-earlier event of the same user
  *    (deterministic (ts, event_id) tie-break, house discipline from
  *    e5_sessionize/q103), then the credited touch types are rolled up
  *    into conversions + attributed revenue. ONE exchange on user_id
  *    feeds the per-user ordered walk (the window), and the rollup
  *    groups a 5-value domain — at 100 TB the sort is per-user-partition
  *    local and the report aggregate is a broadcast-sized frame.
  *    Purchases with no prior touch land in the '(none)' bucket, so the
  *    report is a partition of ALL purchases (auditable total).
  *  - `e100_gini` — per-language Gini coefficient of character-volume
  *    concentration across sources, the curation inequality metric next
  *    to e17's balance and e84's source caps ("how dominated is my
  *    German split by one crawl?"). Sources are ranked by exact integer
  *    volume (ties → source name), and G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) /
  *    (n·Σxᵢ) is evaluated from integer-exact sums in ONE double
  *    division at the end, so the value is engine-reproducible with no
  *    float-summation order dependence. The heavy part (volume per
  *    (lang, source)) is a plain hash aggregate of the corpus; the
  *    ranking runs over the tiny (lang, source) domain.
  *
  * Reference parity: the reference (etl.py:1-246) has neither
  * attribution nor corpus reporting; both rows extend SURVEY §2.6's
  * analytics/curation axis.
  */
object Surface19Queries {
  import Tables._

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q109_attribution" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
      val touched = events(s, dir)
        .withColumn("last_touch",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
      touched
        .where(col("event_type") === "purchase")
        .groupBy(coalesce(col("last_touch"), lit("(none)"))
          .as("touch_type"))
        .agg(count(lit(1)).as("conversions"),
          dsum(col("value"), 2).as("attributed_value"))
    }),

    "e100_gini" -> ((s, dir) => {
      val vol = t(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(sum(col("n_chars")).as("x"))
      val w = Window.partitionBy("lang").orderBy(col("x"), col("source"))
      val ranked = vol.withColumn("i", row_number().over(w))
      val agg = ranked.groupBy("lang")
        .agg(count(lit(1)).as("n_sources"),
          sum(col("x")).as("sx"),
          sum(col("i") * col("x")).as("six"))
      agg.select(col("lang"), col("n_sources"),
        ((lit(2) * col("six") - (col("n_sources") + lit(1)) * col("sx"))
          .cast("double") /
          (col("n_sources") * col("sx")).cast("double")).as("gini"))
    }))

  val oracles: Map[String, String] = Map(
    "q109_attribution" ->
      """WITH touched AS (
           SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase'
                 THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch
           FROM events)
         SELECT coalesce(last_touch, '(none)') AS touch_type,
           count(*) AS conversions,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,2))) AS VARCHAR)
             AS DOUBLE) AS attributed_value
         FROM touched WHERE event_type = 'purchase'
         GROUP BY touch_type""",
    "e100_gini" ->
      """WITH vol AS (
           SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS x
           FROM documents GROUP BY lang, source),
         ranked AS (
           SELECT lang, x,
             row_number() OVER (PARTITION BY lang ORDER BY x, source) AS i
           FROM vol),
         agg AS (
           SELECT lang, count(*) AS n_sources,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(i * x) AS BIGINT) AS six
           FROM ranked GROUP BY lang)
         SELECT lang, n_sources,
           CAST(2 * six - (n_sources + 1) * sx AS DOUBLE) /
             CAST(n_sources * sx AS DOUBLE) AS gini
         FROM agg""")
}
