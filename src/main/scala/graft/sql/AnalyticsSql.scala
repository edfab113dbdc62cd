package graft.sql

/** The reference's four analytics queries as SQL TEXT, run through
  * `spark.sql` against the registered views — the dialect-level surface a
  * reference user actually pastes (`sample_queries.sql:1-58`). The texts
  * are the reference's own, unchanged except:
  *  - Query 3's `CURRENT_DATE` is a parameter (the engine's injectable
  *    clock; the reference pins "today" to the wall clock).
  *  - Query 4's `100.0` literal is cast to DOUBLE: Spark SQL (like
  *    Athena) types the bare literal DECIMAL, and the decimal division
  *    would make `percentage` a decimal column where the DataFrame form
  *    produces double — same values, different wire type.
  * Catalyst plans these identically to the [[Analytics]] DataFrame forms
  * (same views, same aggregates) — the `wx_sql_q*` CORRECTNESS entries
  * share the `wx_q*` oracles to prove dialect-level parity.
  */
object AnalyticsSql {

  /** Query 1 (`sample_queries.sql:3-16`): accuracy by time horizon. */
  val q1: String =
    """SELECT
      |    CASE
      |        WHEN forecast_horizon_hours <= 24 THEN '0-24 hours'
      |        WHEN forecast_horizon_hours <= 48 THEN '24-48 hours'
      |        WHEN forecast_horizon_hours <= 72 THEN '48-72 hours'
      |        ELSE '72+ hours'
      |    END AS horizon_bucket,
      |    COUNT(*) AS total_forecasts,
      |    ROUND(AVG(temp_absolute_error), 2) AS avg_error_celsius,
      |    ROUND(AVG(CAST(is_accurate_forecast AS INT)) * 100, 1) AS accuracy_pct
      |FROM fact_forecast_accuracy
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Query 2 (`sample_queries.sql:18-29`): city performance ranking. */
  val q2: String =
    """SELECT
      |    dl.location_name,
      |    dl.country_code,
      |    COUNT(*) AS total_forecasts,
      |    ROUND(AVG(fa.temp_absolute_error), 2) AS avg_error,
      |    ROUND(AVG(CAST(fa.is_accurate_forecast AS INT)) * 100, 1) AS accuracy_pct
      |FROM fact_forecast_accuracy fa
      |JOIN dim_location dl ON fa.location_key = dl.location_key
      |WHERE dl.is_current = true
      |GROUP BY dl.location_name, dl.country_code
      |ORDER BY accuracy_pct DESC""".stripMargin

  /** Query 3 (`sample_queries.sql:31-43`): current weather summary.
    * `onDate` stands in for the reference's CURRENT_DATE. */
  def q3(onDate: String): String =
    s"""SELECT
       |    dl.location_name,
       |    fa.observation_time,
       |    fa.temperature_celsius,
       |    fa.weather_condition,
       |    fa.humidity_percent,
       |    fa.wind_speed_mps
       |FROM fact_weather_actual fa
       |JOIN dim_location dl ON fa.location_key = dl.location_key
       |WHERE dl.is_current = true
       |  AND DATE(fa.observation_time) = DATE'$onDate'
       |ORDER BY dl.location_name""".stripMargin

  /** Query 4 (`sample_queries.sql:45-58`): forecast quality distribution. */
  val q4: String =
    """SELECT
      |    temp_accuracy_category,
      |    COUNT(*) AS forecast_count,
      |    ROUND(COUNT(*) * CAST(100.0 AS DOUBLE) / SUM(COUNT(*)) OVER (), 1) AS percentage
      |FROM fact_forecast_accuracy
      |GROUP BY temp_accuracy_category
      |ORDER BY
      |    CASE temp_accuracy_category
      |        WHEN 'Excellent' THEN 1
      |        WHEN 'Good' THEN 2
      |        WHEN 'Fair' THEN 3
      |        WHEN 'Poor' THEN 4
      |    END""".stripMargin
}
