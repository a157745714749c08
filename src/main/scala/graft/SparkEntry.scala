package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-block objects under graft.queries; each
  * block pairs a DataFrame plan with DuckDB-runnable oracle SQL over the
  * same parquet tables (column names aligned on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q105_webcompat_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ WindowQueries.queries ++
      ArrayJsonQueries.queries ++ StatQueries.queries ++ LlmQueries.queries ++
      InfraQueries.queries ++ SourceQueries.queries ++ FlagshipQuery.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ WindowQueries.oracles ++
      ArrayJsonQueries.oracles ++ StatQueries.oracles ++ LlmQueries.oracles ++
      InfraQueries.oracles ++ SourceQueries.oracles ++ FlagshipQuery.oracles
}
