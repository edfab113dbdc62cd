package graft.sql

import org.apache.spark.sql.SparkSession

/** The reference's view DDL as runnable Spark SQL TEXT
  * (`create_views.sql:6-115` via `spark.sql(CREATE OR REPLACE TEMPORARY
  * VIEW ...)`) — the dialect-parity counterpart to the [[FactViews]]
  * DataFrame builders, completing the SQL surface a reference user
  * pastes (views here, queries in [[AnalyticsSql]]).
  *
  * Texts are the reference's own, with documented deviations:
  *  - `weather_dwh.` database prefix dropped (session temp views);
  *  - Presto's `TO_UNIXTIME` → Spark's `unix_timestamp` (same
  *    semantics, engine-local name);
  *  - `CURRENT_TIMESTAMP` → an injected literal (the engine's
  *    deterministic-clock policy, as in AnalyticsSql's CURRENT_DATE);
  *  - the reference's global `ROW_NUMBER() OVER (ORDER BY k)` surrogate
  *    keys are computed by the equivalent TWO-PASS partition-offset form
  *    (round-17): a per-day `ROW_NUMBER() OVER (PARTITION BY day(k)
  *    ORDER BY k)` plus each day's cumulative row offset, where the
  *    offsets come from a triangular join over the tiny per-day count
  *    aggregate. Day-of-k is monotone in k, so `offset + local row
  *    number` enumerates rows in exactly the reference's global order —
  *    key-for-key identical output (up to the reference's own
  *    nondeterministic tie order within equal k) — but no single-
  *    partition `WindowExec` ever materializes the whole fact table on
  *    one task (the 100 TB wall Spark itself warns about: "No Partition
  *    Defined for Window operation! Moving all data to a single
  *    partition"). `wx_ddl_q{1,4}` prove the analytics agree;
  *  - a `suffix` parameterizes the view names so the SQL-defined views
  *    can coexist with the DataFrame-registered ones in one session.
  */
object FactViewsSql {

  def actualSql(suffix: String): String =
    s"""CREATE OR REPLACE TEMPORARY VIEW fact_weather_actual$suffix AS
       |WITH joined AS (
       |    SELECT
       |        dl.location_key,
       |        dd.date_key,
       |        cw.observation_time,
       |        cw.temperature_celsius,
       |        cw.feels_like_celsius,
       |        cw.temp_min_celsius,
       |        cw.temp_max_celsius,
       |        cw.humidity_percent,
       |        cw.pressure_hpa,
       |        cw.wind_speed_mps,
       |        cw.wind_direction_deg,
       |        cw.wind_gust_mps,
       |        cw.cloud_cover_percent,
       |        cw.visibility_meters,
       |        cw.weather_condition,
       |        cw.weather_description,
       |        cw.is_daytime,
       |        cw.heat_index_category,
       |        cw.batch_id,
       |        cw.processed_timestamp
       |    FROM current_weather cw
       |    INNER JOIN dim_location dl
       |        ON cw.location_name = dl.location_name
       |        AND cw.country_code = dl.country_code
       |        AND dl.is_current = true
       |    INNER JOIN dim_date dd
       |        ON CAST(cw.observation_date AS DATE) = dd.full_date
       |),
       |day_counts AS (
       |    SELECT CAST(observation_time AS DATE) AS d, COUNT(*) AS c
       |    FROM joined
       |    GROUP BY CAST(observation_time AS DATE)
       |),
       |day_offsets AS (
       |    SELECT a.d, COALESCE(SUM(b.c), 0L) AS off
       |    FROM day_counts a
       |    LEFT JOIN day_counts b
       |        ON b.d < a.d OR (b.d IS NULL AND a.d IS NOT NULL)
       |    GROUP BY a.d
       |)
       |SELECT
       |    CAST(ROW_NUMBER() OVER (
       |            PARTITION BY CAST(j.observation_time AS DATE)
       |            ORDER BY j.observation_time)
       |         + o.off AS INT) AS actual_weather_key,
       |    j.location_key,
       |    j.date_key,
       |    j.observation_time,
       |    j.temperature_celsius,
       |    j.feels_like_celsius,
       |    j.temp_min_celsius,
       |    j.temp_max_celsius,
       |    j.humidity_percent,
       |    j.pressure_hpa,
       |    j.wind_speed_mps,
       |    j.wind_direction_deg,
       |    j.wind_gust_mps,
       |    j.cloud_cover_percent,
       |    j.visibility_meters,
       |    j.weather_condition,
       |    j.weather_description,
       |    j.is_daytime,
       |    j.heat_index_category,
       |    j.batch_id,
       |    j.processed_timestamp
       |FROM joined j
       |INNER JOIN day_offsets o
       |    ON CAST(j.observation_time AS DATE) <=> o.d""".stripMargin

  def forecastSql(suffix: String): String =
    s"""CREATE OR REPLACE TEMPORARY VIEW fact_weather_forecast$suffix AS
       |WITH joined AS (
       |    SELECT
       |        dl.location_key,
       |        dd_created.date_key AS forecast_created_date_key,
       |        dd_forecast.date_key AS forecast_for_date_key,
       |        fw.forecast_created_time,
       |        fw.forecast_for_time,
       |        fw.forecast_horizon_hours,
       |        fw.temperature_celsius_forecast,
       |        fw.feels_like_celsius_forecast,
       |        fw.humidity_percent_forecast,
       |        fw.pressure_hpa_forecast,
       |        fw.wind_speed_mps_forecast,
       |        fw.wind_direction_deg_forecast,
       |        fw.cloud_cover_percent_forecast,
       |        fw.precipitation_probability,
       |        fw.weather_condition_forecast,
       |        fw.batch_id,
       |        fw.processed_timestamp
       |    FROM forecast_weather fw
       |    INNER JOIN dim_location dl
       |        ON fw.location_name = dl.location_name
       |        AND fw.country_code = dl.country_code
       |        AND dl.is_current = true
       |    INNER JOIN dim_date dd_created
       |        ON CAST(fw.forecast_created_date AS DATE) = dd_created.full_date
       |    INNER JOIN dim_date dd_forecast
       |        ON CAST(fw.forecast_for_date AS DATE) = dd_forecast.full_date
       |),
       |day_counts AS (
       |    SELECT CAST(forecast_created_time AS DATE) AS d, COUNT(*) AS c
       |    FROM joined
       |    GROUP BY CAST(forecast_created_time AS DATE)
       |),
       |day_offsets AS (
       |    SELECT a.d, COALESCE(SUM(b.c), 0L) AS off
       |    FROM day_counts a
       |    LEFT JOIN day_counts b
       |        ON b.d < a.d OR (b.d IS NULL AND a.d IS NOT NULL)
       |    GROUP BY a.d
       |)
       |SELECT
       |    CAST(ROW_NUMBER() OVER (
       |            PARTITION BY CAST(j.forecast_created_time AS DATE)
       |            ORDER BY j.forecast_created_time, j.forecast_for_time)
       |         + o.off AS INT) AS forecast_key,
       |    j.location_key,
       |    j.forecast_created_date_key,
       |    j.forecast_for_date_key,
       |    j.forecast_created_time,
       |    j.forecast_for_time,
       |    j.forecast_horizon_hours,
       |    j.temperature_celsius_forecast,
       |    j.feels_like_celsius_forecast,
       |    j.humidity_percent_forecast,
       |    j.pressure_hpa_forecast,
       |    j.wind_speed_mps_forecast,
       |    j.wind_direction_deg_forecast,
       |    j.cloud_cover_percent_forecast,
       |    j.precipitation_probability,
       |    j.weather_condition_forecast,
       |    j.batch_id,
       |    j.processed_timestamp
       |FROM joined j
       |INNER JOIN day_offsets o
       |    ON CAST(j.forecast_created_time AS DATE) <=> o.d""".stripMargin

  def accuracySql(suffix: String, clockTs: String): String =
    s"""CREATE OR REPLACE TEMPORARY VIEW fact_forecast_accuracy$suffix AS
       |WITH joined AS (
       |    SELECT
       |        f.location_key,
       |        f.forecast_created_date_key,
       |        f.forecast_for_date_key,
       |        f.forecast_horizon_hours,
       |        f.temperature_celsius_forecast,
       |        a.temperature_celsius AS temperature_celsius_actual,
       |        (f.temperature_celsius_forecast - a.temperature_celsius) AS temp_error_celsius,
       |        ABS(f.temperature_celsius_forecast - a.temperature_celsius) AS temp_absolute_error,
       |        f.humidity_percent_forecast,
       |        a.humidity_percent AS humidity_percent_actual,
       |        (f.humidity_percent_forecast - a.humidity_percent) AS humidity_error_percent,
       |        f.wind_speed_mps_forecast,
       |        a.wind_speed_mps AS wind_speed_mps_actual,
       |        f.weather_condition_forecast,
       |        a.weather_condition AS weather_condition_actual,
       |        CASE
       |            WHEN f.weather_condition_forecast = a.weather_condition THEN true
       |            ELSE false
       |        END AS condition_match,
       |        f.forecast_created_time,
       |        f.forecast_for_time,
       |        a.observation_time AS actual_observation_time,
       |        CAST(TIMESTAMP'$clockTs' AS TIMESTAMP) AS created_timestamp,
       |        CASE
       |            WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 1 THEN 'Excellent'
       |            WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 3 THEN 'Good'
       |            WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 5 THEN 'Fair'
       |            ELSE 'Poor'
       |        END AS temp_accuracy_category,
       |        CASE
       |            WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 3
       |                 AND f.weather_condition_forecast = a.weather_condition
       |            THEN true
       |            ELSE false
       |        END AS is_accurate_forecast
       |    FROM fact_weather_forecast$suffix f
       |    INNER JOIN fact_weather_actual$suffix a
       |        ON f.location_key = a.location_key
       |        AND ABS(
       |            unix_timestamp(CAST(f.forecast_for_time AS TIMESTAMP)) -
       |            unix_timestamp(CAST(a.observation_time AS TIMESTAMP))
       |        ) < 3600
       |),
       |day_counts AS (
       |    SELECT CAST(forecast_created_time AS DATE) AS d, COUNT(*) AS c
       |    FROM joined
       |    GROUP BY CAST(forecast_created_time AS DATE)
       |),
       |day_offsets AS (
       |    SELECT a.d, COALESCE(SUM(b.c), 0L) AS off
       |    FROM day_counts a
       |    LEFT JOIN day_counts b
       |        ON b.d < a.d OR (b.d IS NULL AND a.d IS NOT NULL)
       |    GROUP BY a.d
       |)
       |SELECT
       |    CAST(ROW_NUMBER() OVER (
       |            PARTITION BY CAST(j.forecast_created_time AS DATE)
       |            ORDER BY j.forecast_created_time, j.forecast_for_time)
       |         + o.off AS INT) AS accuracy_key,
       |    j.location_key,
       |    j.forecast_created_date_key,
       |    j.forecast_for_date_key,
       |    j.forecast_horizon_hours,
       |    j.temperature_celsius_forecast,
       |    j.temperature_celsius_actual,
       |    j.temp_error_celsius,
       |    j.temp_absolute_error,
       |    j.humidity_percent_forecast,
       |    j.humidity_percent_actual,
       |    j.humidity_error_percent,
       |    j.wind_speed_mps_forecast,
       |    j.wind_speed_mps_actual,
       |    j.weather_condition_forecast,
       |    j.weather_condition_actual,
       |    j.condition_match,
       |    j.forecast_created_time,
       |    j.forecast_for_time,
       |    j.actual_observation_time,
       |    j.created_timestamp,
       |    j.temp_accuracy_category,
       |    j.is_accurate_forecast
       |FROM joined j
       |INNER JOIN day_offsets o
       |    ON CAST(j.forecast_created_time AS DATE) <=> o.d""".stripMargin

  /** Execute the three view DDLs (suffix-namespaced) against the
    * session's registered silver/dim views. */
  def registerAll(spark: SparkSession, clockTs: String, suffix: String = "_ddl"): Unit = {
    spark.sql(actualSql(suffix))
    spark.sql(forecastSql(suffix))
    spark.sql(accuracySql(suffix, clockTs))
  }
}
