package graft.model

import org.apache.spark.sql.types._

/** Explicit permissive schemas for the bronze weather JSON.
  *
  * The reference infers schemas from JSON at read time
  * (`bronze_to_silver.py:30`, `:130`) and then probes the inferred schema
  * for the optional `wind.gust` field (`bronze_to_silver.py:35-42`). An
  * explicit permissive schema solves the same evolution problem without a
  * full inference pass over the data (which at 100 TB would be a second
  * read of every byte): `wind.gust` is declared nullable, so it always
  * exists and is simply null when absent from a given file.
  */
object Schemas {

  private def d = DoubleType
  private def l = LongType
  private def s = StringType

  val weatherCondition: ArrayType = ArrayType(
    StructType(
      Seq(
        StructField("id", l),
        StructField("main", s),
        StructField("description", s),
        StructField("icon", s)
      )),
    containsNull = true
  )

  /** One current-weather API payload, annotated by the extractor
    * (`weather_extractor_lambda.py:109-116`). */
  val currentBronze: StructType = StructType(
    Seq(
      StructField("city_name", s),
      StructField("country", s),
      StructField("extraction_timestamp", s),
      StructField("batch_id", s),
      StructField("data_type", s),
      StructField(
        "coord",
        StructType(Seq(StructField("lat", d), StructField("lon", d)))),
      StructField(
        "main",
        StructType(Seq(
          StructField("temp", d),
          StructField("feels_like", d),
          StructField("temp_min", d),
          StructField("temp_max", d),
          StructField("pressure", l),
          StructField("humidity", l)
        ))),
      StructField(
        "wind",
        StructType(Seq(
          StructField("speed", d),
          StructField("deg", l),
          // nullable by declaration: replaces the reference's runtime
          // schema probe (bronze_to_silver.py:35-42)
          StructField("gust", d)
        ))),
      StructField("clouds", StructType(Seq(StructField("all", l)))),
      StructField("visibility", l),
      StructField("weather", weatherCondition),
      StructField("timezone", l),
      StructField(
        "sys",
        StructType(Seq(StructField("sunrise", l), StructField("sunset", l))))
    ))

  /** One forecast API payload: 40 points in `list`
    * (`bronze_to_silver.py:135-165`). */
  val forecastBronze: StructType = StructType(
    Seq(
      StructField("city_name", s),
      StructField("country", s),
      StructField("extraction_timestamp", s),
      StructField("batch_id", s),
      StructField("data_type", s),
      StructField(
        "list",
        ArrayType(
          StructType(Seq(
            StructField("dt", l),
            StructField(
              "main",
              StructType(Seq(
                StructField("temp", d),
                StructField("feels_like", d),
                StructField("pressure", l),
                StructField("humidity", l)
              ))),
            StructField(
              "wind",
              StructType(Seq(StructField("speed", d), StructField("deg", l)))),
            StructField("clouds", StructType(Seq(StructField("all", l)))),
            StructField("pop", d),
            StructField("weather", weatherCondition)
          )),
          containsNull = true
        )
      )
    ))
}
