package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's four user-facing analytics queries
  * (`sample_queries.sql:1-58`), as DataFrame transformations over the fact
  * views. Each aggregation is a partial+final hash aggregate (map-side
  * combine) — the groupBy keys are low-cardinality, so the shuffle moves
  * only one row per key per map task.
  */
object Analytics {

  /** Horizon bucket CASE ladder (`sample_queries.sql:4-10`). Total: every
    * non-null horizon lands in exactly one bucket. */
  def horizonBucket(horizonHours: Column): Column =
    when(horizonHours <= 24, "0-24 hours")
      .when(horizonHours <= 48, "24-48 hours")
      .when(horizonHours <= 72, "48-72 hours")
      .otherwise("72+ hours")

  /** Query 1: accuracy by time horizon (`sample_queries.sql:3-16`):
    * A1/A3/A4 aggregate over the computed bucket, O1 sort. */
  def accuracyByHorizon(factAccuracy: DataFrame): DataFrame =
    factAccuracy
      .groupBy(horizonBucket(col("forecast_horizon_hours")).alias("horizon_bucket"))
      .agg(
        count(lit(1)).alias("total_forecasts"),
        round(avg(col("temp_absolute_error")), 2).alias("avg_error_celsius"),
        round(avg(col("is_accurate_forecast").cast("int")) * 100, 1).alias("accuracy_pct")
      )
      .orderBy(col("horizon_bucket"))

  /** Query 2: city performance ranking (`sample_queries.sql:18-29`):
    * A2 multi-key groupBy + J5 dim join (broadcast). */
  def cityRanking(factAccuracy: DataFrame, dimLocation: DataFrame): DataFrame =
    factAccuracy
      .join(broadcast(dimLocation.filter(col("is_current") === true)), Seq("location_key"))
      .groupBy(col("location_name"), col("country_code"))
      .agg(
        count(lit(1)).alias("total_forecasts"),
        round(avg(col("temp_absolute_error")), 2).alias("avg_error"),
        round(avg(col("is_accurate_forecast").cast("int")) * 100, 1).alias("accuracy_pct")
      )
      .orderBy(col("accuracy_pct").desc, col("location_name"))

  /** Query 3: current weather summary for one day
    * (`sample_queries.sql:31-43`): P8 date-equality filter; the reference
    * uses CURRENT_DATE — the date is a parameter here (injectable clock). */
  def weatherSummary(factActual: DataFrame, dimLocation: DataFrame, onDate: Column): DataFrame =
    factActual
      .join(broadcast(dimLocation.filter(col("is_current") === true)), Seq("location_key"))
      .filter(to_date(col("observation_time")) === onDate)
      .select(
        col("location_name"),
        col("observation_time"),
        col("temperature_celsius"),
        col("weather_condition"),
        col("humidity_percent"),
        col("wind_speed_mps"))
      .orderBy(col("location_name"), col("observation_time"))

  /** Query 4: forecast quality distribution (`sample_queries.sql:45-58`):
    * W3 percent-of-total empty-frame window + O2 CASE-rank sort. */
  def qualityDistribution(factAccuracy: DataFrame): DataFrame =
    factAccuracy
      .groupBy(col("temp_accuracy_category"))
      .agg(count(lit(1)).alias("forecast_count"))
      .withColumn(
        "percentage",
        round(col("forecast_count") * 100.0 / sum(col("forecast_count")).over(Window.partitionBy()), 1))
      .orderBy(categoryRank(col("temp_accuracy_category")))

  /** O2: explicit quality ordering (`sample_queries.sql:52-58`). */
  def categoryRank(category: Column): Column =
    when(category === "Excellent", 1)
      .when(category === "Good", 2)
      .when(category === "Fair", 3)
      .when(category === "Poor", 4)
}
