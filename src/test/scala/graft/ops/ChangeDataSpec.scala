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

  // ---- MERGE INTO ----

  private val mergeTarget = Seq(
    (1L, "alice", 100.0),  // matched, updated
    (2L, "bob", 200.0),    // matched, delete clause fires
    (3L, "carol", 300.0)   // not matched by source: passes through
  ).toDF("k", "name", "bal")

  private val mergeSource = Seq(
    (1L, 50.0, false),
    (2L, 999.0, true),   // del flag → WHEN MATCHED AND del THEN DELETE
    (4L, 40.0, false),   // not matched → insert
    (5L, 60.0, true)     // not matched: delete clause must NOT suppress insert
  ).toDF("k", "delta", "del")

  private def runMerge(broadcastSource: Boolean) =
    ChangeData.mergeInto(
      mergeTarget, mergeSource, Seq("k"),
      updateSet = Map("bal" -> (col("__t.bal") + col("__s.delta"))),
      deleteWhen = Some(col("__s.del")),
      insertValues = Map(
        "name" -> concat(lit("new-"), col("__s.k")),
        "bal" -> col("__s.delta")),
      broadcastSource = broadcastSource)

  test("mergeInto applies delete-first, update, insert, and pass-through clauses") {
    for (bc <- Seq(true, false)) {
      val out = runMerge(bc).orderBy(col("k")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(out === Seq(
        (1L, "alice", 150.0),
        (3L, "carol", 300.0),
        (4L, "new-4", 40.0),
        (5L, "new-5", 60.0)), s"broadcastSource=$bc")
    }
  }

  test("mergeInto broadcast and full-outer plans agree row-for-row") {
    val a = runMerge(broadcastSource = true)
    val b = runMerge(broadcastSource = false)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("mergeInto low-shuffle plan broadcasts: no exchange of the target side") {
    val plan = runMerge(broadcastSource = true).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("mergeInto insertWhen gates inserts without touching matched rows") {
    val out = ChangeData.mergeInto(
      mergeTarget, mergeSource, Seq("k"),
      updateSet = Map("bal" -> (col("__t.bal") + col("__s.delta"))),
      insertValues = Map(
        "name" -> concat(lit("new-"), col("__s.k")),
        "bal" -> col("__s.delta")),
      insertWhen = Some(col("__s.delta") > 50.0),
      broadcastSource = true)
      .orderBy(col("k")).collect().map(_.getLong(0)).toSeq
    assert(out === Seq(1L, 2L, 3L, 5L)) // 4 (delta 40) filtered; 2 kept (no delete clause)
  }

  test("mergeInto rejects duplicate source keys (cardinality violation)") {
    val dupSource = mergeSource.unionAll(mergeSource.limit(1))
    val e = intercept[IllegalArgumentException] {
      ChangeData.mergeInto(
        mergeTarget, dupSource, Seq("k"),
        updateSet = Map("bal" -> col("__s.delta")))
    }
    assert(e.getMessage.contains("cardinality"))
  }

  test("incremental aggregate refresh: any delta split equals the one-shot recompute") {
    val rnd = new scala.util.Random(11)
    val facts = Seq.tabulate(500)(i => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "v")
    val oneShot = ChangeData.aggState(facts, Seq("k"), Seq("v"))
    // three different splits, folded through the snapshot table
    for ((splits, idx) <- Seq(Seq(100, 400), Seq(250, 250), Seq(1, 499)).zipWithIndex) {
      val dir = java.nio.file.Files.createTempDirectory(s"incr$idx").toString + "/t"
      var off = 0
      splits.foreach { len =>
        val part = facts.limit(off + len).exceptAll(facts.limit(off))
        ChangeData.incrementalAggCommit(spark, dir, part, Seq("k"), Seq("v"))
        off += len
      }
      val folded = graft.store.SnapshotStore.read(spark, dir)
      assert(folded.exceptAll(oneShot).count() === 0 && oneShot.exceptAll(folded).count() === 0,
        s"split $splits diverged from the one-shot aggregate")
    }
  }

  test("mergeCommit publishes the merged table as the next atomic snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("merge_commit").toString
    val table = s"$dir/t"
    graft.store.SnapshotStore.commit(mergeTarget, table)
    val v = ChangeData.mergeCommit(
      spark, table, mergeSource, Seq("k"),
      updateSet = Map("bal" -> (col("__t.bal") + col("__s.delta"))),
      deleteWhen = Some(col("__s.del")),
      insertValues = Map(
        "name" -> concat(lit("new-"), col("__s.k")),
        "bal" -> col("__s.delta")))
    assert(v === 1L)
    val cur = graft.store.SnapshotStore.read(spark, table)
      .orderBy(col("k")).collect().map(_.getLong(0)).toSeq
    assert(cur === Seq(1L, 3L, 4L, 5L))
    // time travel still sees the pre-merge snapshot
    val old = graft.store.SnapshotStore.readVersion(spark, table, 0L)
      .orderBy(col("k")).collect().map(_.getLong(0)).toSeq
    assert(old === Seq(1L, 2L, 3L))
  }
}
