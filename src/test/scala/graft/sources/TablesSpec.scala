package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TablesSpec extends SparkSuite {

  test("events epochs are session-timezone independent, and the session TZ is restored") {
    // the timestamp[us] path casts NTZ→timestamp, which interprets the
    // naive value in the SESSION timezone — a session whose TZ drifted
    // from UTC would silently shift ts_us by the local offset vs the
    // DuckDB oracle's epoch_us. events() pins UTC around the analysis of
    // the frame it builds (the zone is baked into the resolved Cast), so
    // the derivation must survive a poisoned session conf — WITHOUT
    // leaving the caller's deliberate TZ choice overwritten.
    val utc = Tables.events(spark, sf())
      .agg(min(col("ts_us")), max(col("ts_us"))).head()
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val drifted = Tables.events(spark, sf())
        .agg(min(col("ts_us")), max(col("ts_us"))).head()
      assert(drifted === utc, s"ts_us shifted with session TZ: $drifted vs $utc")
      // the caller's TZ is restored, not overwritten to UTC
      assert(spark.conf.get("spark.sql.session.timeZone") === "America/New_York")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }
}
