package graft

import graft.queries.{CompositeQueries, CorpusQueries, EventAnalytics, FormatQueries, LlmQueries, ModernSqlQueries, PruningQueries, RelationalQueries, WeatherQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (relational + composite) plus the training-data-pipeline operators
  * (dedup / similarity / text / multimodal). `oracleSql` carries the
  * DuckDB-dialect equivalent for every SQL-expressible query; entries
  * without an oracle (Spark-specific hashing, stub codecs) get the
  * driver's rows-only check and are covered by ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Accuracy-by-horizon over band-joined event pairs — band join,
    * accuracy derivation, horizon bucketing, aggregation, sort in one
    * plan (the Spark collapse of `sample_queries.sql:3-16`). */
  def entry(spark: SparkSession): DataFrame =
    CompositeQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ CompositeQueries.queries ++ LlmQueries.queries ++
      WeatherQueries.queries ++ EventAnalytics.queries ++ CorpusQueries.queries ++
      PruningQueries.queries ++ FormatQueries.queries ++ ModernSqlQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ CompositeQueries.oracles ++ LlmQueries.oracles ++
      WeatherQueries.oracles ++ EventAnalytics.oracles ++ CorpusQueries.oracles ++
      PruningQueries.oracles ++ FormatQueries.oracles ++ ModernSqlQueries.oracles
}
