package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** CDC changelog application and snapshot diffing. */
class ChangeDataSpec extends SparkSuite {

  import spark.implicits._

  private val changelog = Seq(
    // (key, version, op, payload)
    (1L, 1L, "I", "a"),
    (1L, 3L, "U", "c"),
    (1L, 2L, "U", "b"), // out of order: version 3 must win
    (2L, 1L, "I", "x"),
    (2L, 2L, "D", "x"), // deleted: key absent from the result
    (3L, 5L, "I", "only"),
    (4L, 1L, "D", "gone"),
    (4L, 2L, "I", "back") // re-inserted after delete: present
  ).toDF("k", "v", "op", "payload")

  test("applyChangelog keeps the latest version per key and drops tombstoned keys") {
    val out = ChangeData.applyChangelog(changelog, Seq("k"), "v", "op")
      .orderBy(col("k")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSeq ===
      Seq((1L, 3L, "c"), (3L, 5L, "only"), (4L, 2L, "back")))
  }

  test("applyChangelog result is partitioning-invariant (agg, not window)") {
    val a = ChangeData.applyChangelog(changelog, Seq("k"), "v", "op")
    val b = ChangeData.applyChangelog(changelog.repartition(13), Seq("k"), "v", "op")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("applyChangelog plans a partial+final aggregate, no window sort") {
    val plan = ChangeData.applyChangelog(changelog, Seq("k"), "v", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"changelog compaction must not sort per key:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "x")
    val after = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0)).toDF("k", "s", "x")
    val out = ChangeData.snapshotDiff(before, after, Seq("k"))
      .orderBy(col("k")).collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((1L, "unchanged"), (2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("snapshotDiff digest distinguishes null from empty payloads") {
    val before = Seq((1L, Option.empty[String]), (2L, Some(""))).toDF("k", "s")
    val after = Seq((1L, Some("")), (2L, Option.empty[String])).toDF("k", "s")
    val out = ChangeData.snapshotDiff(before, after, Seq("k"))
      .orderBy(col("k")).collect().map(_.getString(1)).toSeq
    assert(out === Seq("changed", "changed"))
  }
}
