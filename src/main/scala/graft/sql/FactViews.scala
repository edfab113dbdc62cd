package graft.sql

import graft.etl.Keys
import graft.etl.Keys.KeyStrategy
import graft.model.Clock
import graft.ops.BandJoin
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The three virtual fact tables (`create_views.sql:6-115`), built as
  * DataFrames and registrable as temp views (S8).
  *
  * Scale notes:
  *  - both dims are broadcast explicitly: dim_location is 8 rows,
  *    dim_date 1096 — never worth a shuffle side.
  *  - surrogate keys default to [[graft.etl.Keys.scalableSurrogate]]
  *    (no global sort — the 100 TB path). Pass
  *    `keys = KeyStrategy.ParityRowNumber` for the reference's dense
  *    ordered `row_number` (W1, `create_views.sql:8,41,73`) with the
  *    ordering extended to a total order so keys are deterministic
  *    (SURVEY §7.4 item 2). Analytics outputs are invariant to the
  *    choice (fact keys are row identities, never join keys) — proven by
  *    the `wx_q{1,4}_parity_keys` CORRECTNESS entries.
  *  - the accuracy view's forecast↔actual band join defaults to the
  *    bucketed strategy ([[graft.ops.BandJoin.bucketed]]); `faithful=true`
  *    reproduces the reference's equi-join + residual-filter shape.
  */
object FactViews {

  /** fact_weather_actual (`create_views.sql:6-35`): J1 multi-key dim join
    * with `is_current`, J2 date-cast join, W1 surrogate key. */
  def factWeatherActual(
      currentSilver: DataFrame,
      dimLocation: DataFrame,
      dimDate: DataFrame,
      keys: KeyStrategy = KeyStrategy.Scalable): DataFrame = {
    val dl = broadcast(dimLocation.filter(col("is_current") === true))
    val dd = broadcast(dimDate)
    currentSilver
      .join(dl, Seq("location_name", "country_code"))
      .join(dd, currentSilver("observation_date").cast("date") === dd("full_date"))
      .select(
        col("location_key"),
        col("date_key"),
        col("observation_time"),
        col("temperature_celsius"),
        col("feels_like_celsius"),
        col("temp_min_celsius"),
        col("temp_max_celsius"),
        col("humidity_percent"),
        col("pressure_hpa"),
        col("wind_speed_mps"),
        col("wind_direction_deg"),
        col("wind_gust_mps"),
        col("cloud_cover_percent"),
        col("visibility_meters"),
        col("weather_condition"),
        col("weather_description"),
        col("is_daytime"),
        col("heat_index_category"),
        col("batch_id"),
        col("processed_timestamp")
      )
      .transform(Keys.surrogate(_, "actual_weather_key",
        Seq(col("observation_time"), col("location_key")), keys))
  }

  /** fact_weather_forecast (`create_views.sql:39-67`): J3 role-playing
    * date dim joined twice under aliases. */
  def factWeatherForecast(
      forecastSilver: DataFrame,
      dimLocation: DataFrame,
      dimDate: DataFrame,
      keys: KeyStrategy = KeyStrategy.Scalable): DataFrame = {
    val dl = broadcast(dimLocation.filter(col("is_current") === true))
    val ddCreated = broadcast(dimDate.select(
      col("full_date").alias("__created_full_date"),
      col("date_key").alias("forecast_created_date_key")))
    val ddForecast = broadcast(dimDate.select(
      col("full_date").alias("__forecast_full_date"),
      col("date_key").alias("forecast_for_date_key")))
    forecastSilver
      .join(dl, Seq("location_name", "country_code"))
      .join(ddCreated, forecastSilver("forecast_created_date").cast("date") === col("__created_full_date"))
      .join(ddForecast, forecastSilver("forecast_for_date").cast("date") === col("__forecast_full_date"))
      .select(
        col("location_key"),
        col("forecast_created_date_key"),
        col("forecast_for_date_key"),
        col("forecast_created_time"),
        col("forecast_for_time"),
        col("forecast_horizon_hours"),
        col("temperature_celsius_forecast"),
        col("feels_like_celsius_forecast"),
        col("humidity_percent_forecast"),
        col("pressure_hpa_forecast"),
        col("wind_speed_mps_forecast"),
        col("wind_direction_deg_forecast"),
        col("cloud_cover_percent_forecast"),
        col("precipitation_probability"),
        col("weather_condition_forecast"),
        col("batch_id"),
        col("processed_timestamp")
      )
      .transform(Keys.surrogate(_, "forecast_key",
        Seq(col("forecast_created_time"), col("forecast_for_time"), col("location_key")), keys))
  }

  /** C3 accuracy derivation columns shared by the weather view and the
    * generic analog (`create_views.sql:80-108`). Inputs are the forecast
    * and actual measure columns; output = error/category/flag columns. */
  def accuracyColumns(
      df: DataFrame,
      forecastTemp: Column,
      actualTemp: Column,
      forecastCond: Column,
      actualCond: Column,
      clock: Clock): DataFrame = {
    val absErr = abs(forecastTemp - actualTemp)
    df.withColumn("temp_error_celsius", forecastTemp - actualTemp)
      .withColumn("temp_absolute_error", absErr)
      .withColumn("condition_match", forecastCond === actualCond)
      .withColumn("created_timestamp", clock.nowTs)
      .withColumn(
        "temp_accuracy_category",
        when(absErr <= 1, "Excellent")
          .when(absErr <= 3, "Good")
          .when(absErr <= 5, "Fair")
          .otherwise("Poor"))
      .withColumn(
        "is_accurate_forecast",
        when(absErr <= 3 && forecastCond === actualCond, true).otherwise(false))
  }

  /** fact_forecast_accuracy (`create_views.sql:71-115`): J4 band join
    * forecast↔actual within ±1 h on the same location, one-to-many. */
  def factForecastAccuracy(
      factForecast: DataFrame,
      factActual: DataFrame,
      clock: Clock,
      faithful: Boolean = false,
      keys: KeyStrategy = KeyStrategy.Scalable): DataFrame = {
    val f = factForecast.select(
      col("location_key"),
      col("forecast_created_date_key"),
      col("forecast_for_date_key"),
      col("forecast_horizon_hours"),
      col("temperature_celsius_forecast"),
      col("humidity_percent_forecast"),
      col("wind_speed_mps_forecast"),
      col("weather_condition_forecast"),
      col("forecast_created_time"),
      col("forecast_for_time"),
      unix_timestamp(col("forecast_for_time")).alias("__f_epoch")
    )
    val a = factActual.select(
      col("location_key"),
      col("temperature_celsius").alias("temperature_celsius_actual"),
      col("humidity_percent").alias("humidity_percent_actual"),
      col("wind_speed_mps").alias("wind_speed_mps_actual"),
      col("weather_condition").alias("weather_condition_actual"),
      col("observation_time").alias("actual_observation_time"),
      unix_timestamp(col("observation_time")).alias("__a_epoch")
    )

    val joined =
      if (faithful)
        f.join(
          a.withColumnRenamed("location_key", "__a_location_key"),
          f("location_key") === col("__a_location_key") &&
            abs(col("__f_epoch") - col("__a_epoch")) < 3600)
      else
        BandJoin.bucketed(f, a, keys = Seq("location_key"),
          leftEpochName = "__f_epoch", rightEpochName = "__a_epoch",
          tolerance = 3600L)

    val base = joined
      .withColumn("humidity_error_percent",
        col("humidity_percent_forecast") - col("humidity_percent_actual"))

    accuracyColumns(
      base,
      col("temperature_celsius_forecast"),
      col("temperature_celsius_actual"),
      col("weather_condition_forecast"),
      col("weather_condition_actual"),
      clock)
      .transform(Keys.surrogate(_, "accuracy_key",
        Seq(col("forecast_created_time"), col("forecast_for_time"),
          col("location_key"), col("actual_observation_time")), keys))
      .drop("__f_epoch", "__a_epoch", "__a_location_key")
  }

  /** S8: register all three views for SQL access. */
  def registerAll(
      spark: SparkSession,
      currentSilver: DataFrame,
      forecastSilver: DataFrame,
      dimLocation: DataFrame,
      dimDate: DataFrame,
      clock: Clock,
      keys: KeyStrategy = KeyStrategy.Scalable): Unit = {
    val actual = factWeatherActual(currentSilver, dimLocation, dimDate, keys)
    val forecast = factWeatherForecast(forecastSilver, dimLocation, dimDate, keys)
    val accuracy = factForecastAccuracy(forecast, actual, clock, keys = keys)
    dimLocation.createOrReplaceTempView("dim_location")
    dimDate.createOrReplaceTempView("dim_date")
    actual.createOrReplaceTempView("fact_weather_actual")
    forecast.createOrReplaceTempView("fact_weather_forecast")
    accuracy.createOrReplaceTempView("fact_forecast_accuracy")
  }
}
