package graft.queries

import graft.fixtures.WeatherDemo
import graft.sql.{Analytics, AnalyticsSql, FactViewsSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CORRECTNESS entries that run the ENTIRE weather warehouse — bronze
  * JSON ingest (S6), multi-line JSON scan (S1), silver sinks (S3),
  * dimension builds + overwrite sinks (C1/C2/S4), fact views
  * (J1-J4/W1/C3), and the reference's four analytics queries — on the
  * deterministic demo fixture with an injected clock. The oracles are
  * hand-computed VALUES literals: the point is that the full pipeline
  * reproduces exactly the numbers the reference's SQL defines.
  */
object WeatherQueries {

  type Q = (SparkSession, String) => DataFrame

  /** S1/S6/P1-P12/C5: flattened, DQ-gated current silver. */
  val wxS1Flatten: Q = (s, _) => {
    WeatherDemo.ensurePipeline(s)
    s.table("current_weather")
      .select(
        col("location_name"),
        col("country_code"),
        col("temperature_celsius"),
        col("wind_gust_mps"),
        col("weather_condition"),
        col("heat_index_category"),
        date_format(col("observation_date"), "yyyy-MM-dd").alias("observation_date"),
        col("is_daytime").cast("int").alias("is_daytime"))
      .orderBy(col("location_name"))
  }

  /** Reference Query 1 (`sample_queries.sql:3-16`) over the demo facts. */
  val wxQ1Accuracy: Q = (s, _) => {
    WeatherDemo.ensurePipeline(s)
    Analytics.accuracyByHorizon(s.table("fact_forecast_accuracy"))
  }

  /** Reference Query 2 (`sample_queries.sql:18-29`). */
  val wxQ2CityRanking: Q = (s, _) => {
    WeatherDemo.ensurePipeline(s)
    Analytics.cityRanking(s.table("fact_forecast_accuracy"), s.table("dim_location"))
  }

  /** Reference Query 3 (`sample_queries.sql:31-43`) with the injected
    * date standing in for CURRENT_DATE. */
  val wxQ3Summary: Q = (s, _) => {
    WeatherDemo.ensurePipeline(s)
    Analytics.weatherSummary(s.table("fact_weather_actual"), s.table("dim_location"), to_date(lit("2024-01-01")))
      .withColumn("observation_time", date_format(col("observation_time"), "yyyy-MM-dd HH:mm:ss"))
  }

  /** Reference Query 4 (`sample_queries.sql:45-58`). */
  val wxQ4Quality: Q = (s, _) => {
    WeatherDemo.ensurePipeline(s)
    Analytics.qualityDistribution(s.table("fact_forecast_accuracy"))
  }

  /** Key-scheme invariance: Q1/Q4 rebuilt with the opt-in parity
    * `row_number` fact keys must match the same hand-computed oracle the
    * default scalable-key pipeline matches — fact keys are row
    * identities, never inputs to analytics. */
  val wxQ1ParityKeys: Q = (s, _) =>
    Analytics.accuracyByHorizon(WeatherDemo.parityKeyAccuracy(s))

  val wxQ4ParityKeys: Q = (s, _) =>
    Analytics.qualityDistribution(WeatherDemo.parityKeyAccuracy(s))

  /** Materialized-gold parity: Q2/Q4 over the PERSISTED fact parquet
    * (Pipeline.run(materializeGold = true)) — the scale answer to
    * Athena-style per-query view recomputation — must land on the same
    * hand-computed numbers as the lazy views. */
  val wxQ2Materialized: Q = (s, _) => {
    val gold = WeatherDemo.ensureMaterializedGold(s)
    Analytics.cityRanking(
      s.read.parquet(s"$gold/fact_forecast_accuracy"),
      s.read.parquet(s"$gold/dim_location"))
  }

  val wxQ4Materialized: Q = (s, _) => {
    val gold = WeatherDemo.ensureMaterializedGold(s)
    Analytics.qualityDistribution(s.read.parquet(s"$gold/fact_forecast_accuracy"))
  }

  /** DDL-level parity: the reference's CREATE VIEW statements executed
    * as SQL text ([[FactViewsSql]], `create_views.sql:6-115`) over the
    * registered silver/dim views, then queried — same hand-computed
    * numbers as the DataFrame-built views. */
  private def ensureDdlViews(s: SparkSession): Unit = {
    WeatherDemo.ensurePipeline(s)
    FactViewsSql.registerAll(s, "2024-01-01 07:00:00")
  }

  val wxDdlQ1: Q = (s, _) => {
    ensureDdlViews(s)
    Analytics.accuracyByHorizon(s.table("fact_forecast_accuracy_ddl"))
  }

  val wxDdlQ4: Q = (s, _) => {
    ensureDdlViews(s)
    Analytics.qualityDistribution(s.table("fact_forecast_accuracy_ddl"))
  }

  /** Dialect-level parity: the reference's queries run as SQL TEXT
    * (`sample_queries.sql` via [[AnalyticsSql]]) against the registered
    * views, sharing the wx_q* oracles. */
  val wxSqlQ1: Q = (s, _) => { WeatherDemo.ensurePipeline(s); s.sql(AnalyticsSql.q1) }
  val wxSqlQ2: Q = (s, _) => { WeatherDemo.ensurePipeline(s); s.sql(AnalyticsSql.q2) }
  val wxSqlQ3: Q = (s, _) => {
    WeatherDemo.ensurePipeline(s)
    // formatted post-SQL for oracle portability, as in wx_q3_summary
    s.sql(AnalyticsSql.q3("2024-01-01"))
      .withColumn("observation_time", date_format(col("observation_time"), "yyyy-MM-dd HH:mm:ss"))
  }
  val wxSqlQ4: Q = (s, _) => { WeatherDemo.ensurePipeline(s); s.sql(AnalyticsSql.q4) }

  /** Catalog-level parity: the warehouse registered as a persistent
    * `weather_dwh` database ([[graft.Pipeline.catalogWarehouse]], the
    * reference's Glue database, `create_views.sql:1-4`), queried from a
    * FRESH session (`newSession()` drops every temp view) — proving a
    * second session runs the reference analytics with no
    * re-registration. Shares the wx_q* oracles. */
  private def freshCatalogSession(s: SparkSession): SparkSession = {
    WeatherDemo.ensureCatalog(s)
    val fresh = s.newSession()
    fresh.sql("USE weather_dwh")
    fresh
  }

  val wxCatQ1: Q = (s, _) => freshCatalogSession(s).sql(AnalyticsSql.q1)
  val wxCatQ4: Q = (s, _) => freshCatalogSession(s).sql(AnalyticsSql.q4)

  private val baseOracles: Map[String, String] = Map(
    "wx_s1_flatten" ->
      """SELECT * FROM (VALUES
           ('London', 'GB', 10.0, 3.5, 'Clouds', 'Cold', '2024-01-01', 0),
           ('Tokyo', 'JP', 28.0, 3.5, 'Clear', 'High Heat', '2024-01-01', 0))
         t(location_name, country_code, temperature_celsius, wind_gust_mps,
           weather_condition, heat_index_category, observation_date, is_daytime)
         ORDER BY location_name""",
    "wx_q1_accuracy" ->
      """SELECT '0-24 hours' AS horizon_bucket, CAST(2 AS BIGINT) AS total_forecasts,
                1.5 AS avg_error_celsius, 50.0 AS accuracy_pct""",
    "wx_q2_city_ranking" ->
      """SELECT * FROM (VALUES
           ('London', 'GB', CAST(1 AS BIGINT), 0.5, 100.0),
           ('Tokyo', 'JP', CAST(1 AS BIGINT), 2.5, 0.0))
         t(location_name, country_code, total_forecasts, avg_error, accuracy_pct)
         ORDER BY accuracy_pct DESC""",
    "wx_q3_summary" ->
      """SELECT * FROM (VALUES
           ('London', '2024-01-01 06:00:00', 10.0, 'Clouds', CAST(70 AS BIGINT), 4.1),
           ('Tokyo', '2024-01-01 06:00:00', 28.0, 'Clear', CAST(55 AS BIGINT), 4.1))
         t(location_name, observation_time, temperature_celsius, weather_condition,
           humidity_percent, wind_speed_mps)
         ORDER BY location_name""",
    "wx_q4_quality" ->
      """SELECT * FROM (VALUES
           ('Excellent', CAST(1 AS BIGINT), 50.0),
           ('Good', CAST(1 AS BIGINT), 50.0))
         t(temp_accuracy_category, forecast_count, percentage)
         ORDER BY temp_accuracy_category"""
  )

  /** Parity-key and SQL-text variants share the base oracles verbatim:
    * same hand-computed numbers regardless of key scheme or dialect. */
  val oracles: Map[String, String] = baseOracles ++ Map(
    "wx_q1_parity_keys" -> baseOracles("wx_q1_accuracy"),
    "wx_q4_parity_keys" -> baseOracles("wx_q4_quality"),
    "wx_mat_q2" -> baseOracles("wx_q2_city_ranking"),
    "wx_mat_q4" -> baseOracles("wx_q4_quality"),
    "wx_ddl_q1" -> baseOracles("wx_q1_accuracy"),
    "wx_ddl_q4" -> baseOracles("wx_q4_quality"),
    "wx_sql_q1" -> baseOracles("wx_q1_accuracy"),
    "wx_sql_q2" -> baseOracles("wx_q2_city_ranking"),
    "wx_sql_q3" -> baseOracles("wx_q3_summary"),
    "wx_sql_q4" -> baseOracles("wx_q4_quality"),
    "wx_cat_q1" -> baseOracles("wx_q1_accuracy"),
    "wx_cat_q4" -> baseOracles("wx_q4_quality")
  )

  val queries: Map[String, Q] = Map(
    "wx_s1_flatten" -> wxS1Flatten,
    "wx_q1_accuracy" -> wxQ1Accuracy,
    "wx_q2_city_ranking" -> wxQ2CityRanking,
    "wx_q3_summary" -> wxQ3Summary,
    "wx_q4_quality" -> wxQ4Quality,
    "wx_q1_parity_keys" -> wxQ1ParityKeys,
    "wx_q4_parity_keys" -> wxQ4ParityKeys,
    "wx_mat_q2" -> wxQ2Materialized,
    "wx_mat_q4" -> wxQ4Materialized,
    "wx_ddl_q1" -> wxDdlQ1,
    "wx_ddl_q4" -> wxDdlQ4,
    "wx_sql_q1" -> wxSqlQ1,
    "wx_sql_q2" -> wxSqlQ2,
    "wx_sql_q3" -> wxSqlQ3,
    "wx_sql_q4" -> wxSqlQ4,
    "wx_cat_q1" -> wxCatQ1,
    "wx_cat_q4" -> wxCatQ4
  )
}
