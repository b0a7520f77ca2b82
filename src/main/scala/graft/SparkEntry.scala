package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming: p_ and s1_ prefixes are transform+source parity
  * (SURVEY.md §2.1, §2.3); c_ and k_ are the CDC+sink surface (§2.2,
  * §2.4); q_ is the relational surface (§2.5-2.6).
  */
object SparkEntry {

  /** Flagship query; driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    queries("q1_agg")(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TransformQueries.all ++ CdcQueries.all ++ RelationalQueries.all ++
      JoinQueries.all ++ SqlSurfaceQueries.all ++ Surface2Queries.all ++
      Surface3Queries.all ++ Surface4Queries.all ++
      StatsQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ WindowQueries.all ++ MiscQueries.all ++
      RuntimeQueries.all ++ Surface5Queries.all ++ Surface6Queries.all ++
      Surface7Queries.all ++ Surface8Queries.all ++ Surface9Queries.all ++
      Surface10Queries.all ++ Surface11Queries.all ++ Surface12Queries.all ++
      Surface13Queries.all ++ Surface14Queries.all ++ Surface15Queries.all ++
      Surface16Queries.all ++ Surface17Queries.all ++
      Surface18Queries.all ++ Surface19Queries.all ++ Surface20Queries.all ++
      Surface21Queries.all ++ Surface22Queries.all ++
      Surface23Queries.all ++ Surface24Queries.all ++ Surface25Queries.all ++
      Surface26Queries.all ++ Surface27Queries.all ++
      Surface28Queries.all ++ Surface29Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    TransformQueries.oracles ++ CdcQueries.oracles ++
      RelationalQueries.oracles ++ JoinQueries.oracles ++
      SqlSurfaceQueries.oracles ++ Surface2Queries.oracles ++
      Surface3Queries.oracles ++ Surface4Queries.oracles ++
      StatsQueries.oracles ++
      TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ WindowQueries.oracles ++
      MiscQueries.oracles ++ RuntimeQueries.oracles ++
      Surface5Queries.oracles ++ Surface6Queries.oracles ++
      Surface7Queries.oracles ++ Surface8Queries.oracles ++
      Surface9Queries.oracles ++ Surface10Queries.oracles ++
      Surface11Queries.oracles ++ Surface12Queries.oracles ++
      Surface13Queries.oracles ++ Surface14Queries.oracles ++
      Surface15Queries.oracles ++ Surface16Queries.oracles ++
      Surface17Queries.oracles ++ Surface18Queries.oracles ++
      Surface19Queries.oracles ++ Surface20Queries.oracles ++
      Surface21Queries.oracles ++ Surface22Queries.oracles ++
      Surface23Queries.oracles ++ Surface24Queries.oracles ++
      Surface25Queries.oracles ++ Surface26Queries.oracles ++
      Surface27Queries.oracles ++ Surface28Queries.oracles ++
      Surface29Queries.oracles
}
