package graft.plans

import graft.SparkSuite
import graft.ops.AsOfNative
import org.apache.spark.sql.functions._

class AsOfNativeSpec extends SparkSuite {

  import spark.implicits._

  private def trades = Seq(
    ("A", 100L, 1.0), ("A", 200L, 2.0), ("A", 310L, 3.0),
    ("B", 150L, 4.0),
    ("C", 500L, 5.0) // key with no quotes at all
  ).toDF("sym", "t", "px")

  private def quotes = Seq(
    ("A", 90L, 10.0), ("A", 190L, 11.0), ("A", 205L, 12.0),
    ("B", 400L, 13.0), // AFTER B's trade — backward as-of must not match
    ("D", 1L, 14.0)    // key never on the left
  ).toDF("sym", "t", "bid")

  test("backward as-of with tolerance: latest quote ≤ trade time, unmatched null-extended") {
    val out = AsOfNative.join(trades, quotes, Seq("sym"), "t", "t", toleranceUs = 100L)
      .select(col("sym"), col("t"), col("px"),
        col("t_r"), col("bid_r"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSet
    assert(out === Set(
      ("A", 100L, 90L, 10.0),   // within 100 of 90
      ("A", 200L, 190L, 11.0),  // 190 beats 90, 205 is in the future
      ("A", 310L, 205L, 12.0),  // wait: 310-205=105 > 100 → should be unmatched
      ("B", 150L, -1L, -1.0),   // only future quote
      ("C", 500L, -1L, -1.0)    // no quotes for key
    ) || out === Set(
      ("A", 100L, 90L, 10.0),
      ("A", 200L, 190L, 11.0),
      ("A", 310L, -1L, -1.0),   // 310-205 = 105 exceeds tolerance 100
      ("B", 150L, -1L, -1.0),
      ("C", 500L, -1L, -1.0)
    ), out.toString)
    // pin the strict expectation: 310-205 = 105 > 100 ⇒ unmatched
    assert(out.contains(("A", 310L, -1L, -1.0)), out.toString)
  }

  test("empty right side: every left row emits null-extended; repeated left times all match") {
    val noQuotes = quotes.filter(col("sym") === "ZZZ")
    val out = AsOfNative.join(trades, noQuotes, Seq("sym"), "t", "t", 1000L)
    assert(out.count() === 5)
    assert(out.filter(col("bid_r").isNotNull).count() === 0)
    // left rows at the SAME (key, time) must each match the same quote
    val dupTrades = Seq(("A", 200L, 1.0), ("A", 200L, 2.0)).toDF("sym", "t", "px")
    val matched = AsOfNative.join(dupTrades, quotes, Seq("sym"), "t", "t", 1000L)
      .select(col("px"), col("bid_r")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(matched === Set((1.0, 11.0), (2.0, 11.0)), matched.toString)
  }

  test("forward as-of: earliest quote ≥ trade time within tolerance; shared future match not consumed") {
    val out = AsOfNative.join(trades, quotes, Seq("sym"), "t", "t",
      toleranceUs = 100L, forward = true)
      .select(col("sym"), col("t"), col("t_r"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out === Set(
      ("A", 100L, 190L),  // next quote at 190, within 100
      ("A", 200L, 205L),  // 205 is the earliest ≥ 200
      ("A", 310L, -1L),   // no future A quote
      ("B", 150L, -1L),   // B quote at 400 exceeds tolerance 100
      ("C", 500L, -1L)
    ), out.toString)
    // two trades sharing one future quote must BOTH match it
    val dup = Seq(("A", 180L, 1.0), ("A", 185L, 2.0)).toDF("sym", "t", "px")
    val both = AsOfNative.join(dup, quotes, Seq("sym"), "t", "t", 100L, forward = true)
      .select(col("px"), col("t_r")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(both === Set((1.0, 190L), (2.0, 190L)), both.toString)
  }

  test("physical plan is the native operator with one exchange + sort per side") {
    val df = AsOfNative.join(trades, quotes, Seq("sym"), "t", "t", 1000L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p) // AsOfJoinExec renders with Exec stripped
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
    assert(!p.contains("Window"), p) // no window, no explode — the merge does it
  }

  test("native range join ≡ naive theta join on the events table; plan is the native node, no explode") {
    val e = graft.sources.Tables.events(spark, sf("sf0.001"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").alias("vid"), col("ts_us").alias("vt"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").alias("p_uid"), col("event_id").alias("pid"), col("ts_us").alias("pt"))
    val tol = 3600L * 1000000L
    val nativeDf = AsOfNative.rangeJoin(
      v, p.withColumnRenamed("p_uid", "user_id"), Seq("user_id"), "vt", "pt", tol)
    val native = nativeDf.select(col("vid"), col("pid_r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val theta = v.join(p, col("user_id") === col("p_uid") &&
        abs(col("vt") - col("pt")) <= tol)
      .select(col("vid"), col("pid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native === theta,
      s"only-native=${native.diff(theta).take(5)} only-theta=${theta.diff(native).take(5)} sizes=${native.size}/${theta.size}")
    val plan = nativeDf.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin "), plan.take(2000))
    assert(!plan.contains("Generate") && !plan.contains("explode"), plan.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan.take(3000))
  }

  test("native as-of agrees with the composed band-join asOf on the events table") {
    val e = graft.sources.Tables.events(spark, sf("sf0.001"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").alias("purchase_id"),
        unix_micros(col("event_time")).alias("pt"))
    // right side unique per (key, time): keep max event_id per instant
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), unix_micros(col("event_time")).alias("vt"))
      .agg(max(col("event_id")).alias("view_id"))
    val tol = 3600L * 1000000L
    val native = AsOfNative.join(p, v, Seq("user_id"), "pt", "vt", tol)
      .select(col("purchase_id"), coalesce(col("view_id_r"), lit(-1L)).alias("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: windowed latest-view-before-purchase within tolerance
    val joined = p.join(v, p("user_id") === v("user_id") &&
        col("vt") <= col("pt") && col("pt") - col("vt") <= tol, "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("purchase_id")).orderBy(col("vt").desc_nulls_last)))
      .filter(col("rk") === 1)
      .select(col("purchase_id"), coalesce(col("view_id"), lit(-1L)).alias("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native === joined,
      s"only-native=${native.diff(joined).take(5)} only-ref=${joined.diff(native).take(5)}")
  }
}
