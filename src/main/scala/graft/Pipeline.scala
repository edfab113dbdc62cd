package graft

import graft.etl.{BronzeToSilver, Dimensions}
import graft.model.{Clock, Schemas, SystemClock}
import graft.sql.FactViews
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7: end-to-end pipeline driver — the Spark-native collapse of the
  * reference's EventBridge→Lambda→Glue→Athena orchestration chain
  * (`weather_extractor_lambda.py:82-90`, `README.md:55-59`): one
  * SparkSession, stages invoked in dependency order, clock injected for
  * deterministic runs.
  */
object Pipeline {

  final case class Layout(bronzeDir: String, silverDir: String, goldDir: String)

  final case class Outputs(
      currentSilver: DataFrame,
      forecastSilver: DataFrame,
      dimLocation: DataFrame,
      dimDate: DataFrame)

  /** Bronze→Silver→Gold→views. Reads bronze JSON (explicit permissive
    * schema), writes silver/gold parquet, registers the fact views, and
    * returns the layer DataFrames (read back from parquet so downstream
    * consumers see exactly what was persisted). */
  def run(spark: SparkSession, layout: Layout, clock: Clock = SystemClock): Outputs = {
    // Stage 1 — bronze → silver (bronze_to_silver.py analog)
    val currentBronze = BronzeToSilver.readBronze(
      spark, s"${layout.bronzeDir}/raw/current/*/*/*/*/*.json", Some(Schemas.currentBronze))
    val forecastBronze = BronzeToSilver.readBronze(
      spark, s"${layout.bronzeDir}/raw/forecast/*/*/*/*/*.json", Some(Schemas.forecastBronze))

    BronzeToSilver.writeSilver(
      BronzeToSilver.currentSilver(currentBronze, clock),
      s"${layout.silverDir}/current_weather", "observation_date")
    BronzeToSilver.writeSilver(
      BronzeToSilver.forecastSilver(forecastBronze, clock),
      s"${layout.silverDir}/forecast_weather", "forecast_created_date")

    val currentSilver = spark.read.parquet(s"${layout.silverDir}/current_weather")
    val forecastSilver = spark.read.parquet(s"${layout.silverDir}/forecast_weather")

    // Stage 2 — silver → gold dims (build_dimensions.py analog);
    // SCD2 "exists" branch = skip, matching build_dimensions.py:96-97
    val dimLocPath = s"${layout.goldDir}/dim_location"
    if (!new java.io.File(dimLocPath).exists())
      Dimensions.writeDim(Dimensions.buildDimLocation(currentSilver, clock), dimLocPath)
    Dimensions.writeDim(Dimensions.buildDimDate(spark), s"${layout.goldDir}/dim_date")

    val dimLocation = spark.read.parquet(dimLocPath)
    val dimDate = spark.read.parquet(s"${layout.goldDir}/dim_date")

    // Stage 3 — fact views (create_views.sql analog)
    FactViews.registerAll(spark, currentSilver, forecastSilver, dimLocation, dimDate, clock)
    currentSilver.createOrReplaceTempView("current_weather")
    forecastSilver.createOrReplaceTempView("forecast_weather")

    Outputs(currentSilver, forecastSilver, dimLocation, dimDate)
  }
}
