package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TablesSpec extends SparkSuite {

  test("events epochs are session-timezone independent (defensive UTC pin in table())") {
    // the timestamp[us] path casts NTZ→timestamp, which interprets the
    // naive value in the SESSION timezone — a session whose TZ drifted
    // from UTC would silently shift ts_us by the local offset vs the
    // DuckDB oracle's epoch_us. table() re-pins UTC, so the derivation
    // must survive a poisoned session conf.
    val utc = Tables.events(spark, sf())
      .agg(min(col("ts_us")), max(col("ts_us"))).head()
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val drifted = Tables.events(spark, sf())
        .agg(min(col("ts_us")), max(col("ts_us"))).head()
      assert(drifted === utc, s"ts_us shifted with session TZ: $drifted vs $utc")
      // and the pin is visible: the read healed the session conf
      assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }
}
