package graft.etl

import graft.SparkSuite
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSuite {

  import spark.implicits._

  private def agg(df: DataFrame): DataFrame =
    df.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).alias("n"), round(sum(col("value")), 4).alias("v"))

  test("incremental refresh touches only the batch's partitions and equals a full recompute") {
    val root = Files.createTempDirectory("graft-incr")
    val path = s"$root/daily_agg"
    def rows(day: String, n: Int, t: String, v: Double) =
      (1 to n).map(i => (day, t, v + i))
    val day1 = rows("2024-01-01", 3, "click", 1.0) ++ rows("2024-01-01", 2, "view", 5.0)
    val day2v1 = rows("2024-01-02", 4, "click", 2.0)

    // initial load: two days
    Incremental.refreshPartitionedAgg(
      spark, (day1 ++ day2v1).toDF("day", "event_type", "value"), path, "day")(agg)
    val day1Files = new java.io.File(s"$path/day=2024-01-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap

    // late batch: day 2 restated (one more row) + a new day 3
    val day2v2 = rows("2024-01-02", 5, "click", 2.0)
    val day3 = rows("2024-01-03", 2, "signup", 0.0)
    val refreshed = Incremental.refreshPartitionedAgg(
      spark, (day2v2 ++ day3).toDF("day", "event_type", "value"), path, "day")(agg)

    // equals the full recompute over the true current state of the world
    // (partitioned read-back moves the partition column last and
    // type-infers the date-shaped directory value — reorder + cast)
    val cols = Seq(col("day").cast("string"), col("event_type"), col("n"), col("v"))
    val full = agg((day1 ++ day2v2 ++ day3).toDF("day", "event_type", "value"))
    assert(refreshed.select(cols: _*).orderBy("day", "event_type").collect().toSeq ===
      full.select(cols: _*).orderBy("day", "event_type").collect().toSeq)

    // day 1's partition was NOT rewritten — its files are byte-identical
    val day1After = new java.io.File(s"$path/day=2024-01-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(day1After === day1Files, "untouched partition was rewritten")
  }
}
