package graft.store

import graft.SparkSuite
import graft.etl.Dimensions
import graft.model.FixedClock
import org.apache.spark.sql.functions._

class SnapshotStoreSpec extends SparkSuite {

  import spark.implicits._

  test("commit/read roundtrip, monotone versions, time travel") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val t = s"$root/t"
    assert(SnapshotStore.currentVersion(spark, t).isEmpty)
    assert(SnapshotStore.commit(spark.range(10).toDF("id"), t) === 0L)
    assert(SnapshotStore.commit(spark.range(25).toDF("id"), t) === 1L)
    assert(SnapshotStore.read(spark, t).count() === 25)
    assert(SnapshotStore.readVersion(spark, t, 0L).count() === 10)
    assert(SnapshotStore.versions(spark, t) === Seq(0L, 1L))
    intercept[IllegalArgumentException](SnapshotStore.readVersion(spark, t, 7L))
  }

  test("schema evolution across versions: each snapshot is self-contained, merges can add columns") {
    val root = java.nio.file.Files.createTempDirectory("graft-snapev").toString
    val t = s"$root/t"
    SnapshotStore.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    // v1 adds a column (widening evolution) — full-snapshot versioning
    // makes this free: no mergeSchema read, no backfill coordination
    val evolved = SnapshotStore.read(spark, t).withColumn("score", col("k") * 10.0)
    SnapshotStore.commit(evolved, t)
    assert(SnapshotStore.read(spark, t).columns.toSeq === Seq("k", "v", "score"))
    // time travel still serves the ORIGINAL schema, not a merged one
    assert(SnapshotStore.readVersion(spark, t, 0L).columns.toSeq === Seq("k", "v"))
    // a MERGE against the evolved table fills the new column for inserts
    val src = Seq((3L, "c", 30.0)).toDF("k", "v", "score")
    graft.ops.ChangeData.mergeCommit(
      spark, t, src, Seq("k"),
      updateSet = Map("score" -> org.apache.spark.sql.functions.col("__s.score")))
    val cur = SnapshotStore.read(spark, t).orderBy(col("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(cur === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("an unpublished data directory is invisible; visibility flips at the marker") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap2").toString
    val t = s"$root/t"
    SnapshotStore.commit(spark.range(10).toDF("id"), t)
    // a writer mid-rewrite: v=1 data exists (even complete!) but no marker
    spark.range(1000).toDF("id").write.parquet(SnapshotStore.versionDir(t, 1L))
    assert(SnapshotStore.currentVersion(spark, t) === Some(0L))
    assert(SnapshotStore.read(spark, t).count() === 10, "reader must not see the unpublished rewrite")
    // the marker lands -> the new snapshot is the table, atomically
    SnapshotStore.publishMarker(spark, t, 1L)
    assert(SnapshotStore.read(spark, t).count() === 1000)
  }

  test("vacuum keeps the newest snapshots and collects crashed-writer orphans") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap3").toString
    val t = s"$root/t"
    (0 until 4).foreach(i => SnapshotStore.commit(spark.range(10 + i).toDF("id"), t))
    // crashed writer: orphan data dir below current, never committed
    spark.range(5).toDF("id").write.parquet(s"$t/v=__broken")
    spark.range(5).toDF("id").write.parquet(SnapshotStore.versionDir(t, 2L) + "_junkdir")
    val deleted = SnapshotStore.vacuum(spark, t, keep = 2)
    assert(deleted === Seq(0L, 1L))
    assert(SnapshotStore.versions(spark, t) === Seq(2L, 3L))
    assert(SnapshotStore.read(spark, t).count() === 13)
    // idempotent
    assert(SnapshotStore.vacuum(spark, t, keep = 2).isEmpty)
  }

  test("concurrent reader during SCD2 merge sees old or new snapshot, never a mix") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap4").toString
    val t = s"$root/dim"
    val attrs0 = Seq(("alice", "nyc"), ("bob", "sf"), ("carol", "ldn")).toDF("name", "city")
    val dim0 = Dimensions.scd2InitialLoad(
      attrs0, "k", Seq(col("name")), FixedClock("2024-06-01 00:00:00"))
    SnapshotStore.commit(dim0, t)

    val oldRows = SnapshotStore.read(spark, t).collect().toSet
    // every key changes city -> merge expires 3 rows and inserts 3
    val attrs1 = Seq(("alice", "berlin"), ("bob", "tokyo"), ("carol", "rome")).toDF("name", "city")

    @volatile var failure: Option[String] = None
    @volatile var done = false
    val reader = new Thread(() => {
      try {
        while (!done) {
          val snap = SnapshotStore.read(spark, t).collect()
          // snapshot invariants that any torn old/new file mix breaks:
          // exactly one current row per key, and a row total of a whole
          // snapshot (3 pre-merge, 6 post-merge)
          val perKeyCurrent = snap.filter(_.getAs[Boolean]("is_current"))
            .groupBy(_.getAs[String]("name")).view.mapValues(_.length).toMap
          if (!(snap.length == 3 || snap.length == 6))
            failure = Some(s"torn snapshot: ${snap.length} rows")
          else if (perKeyCurrent.values.exists(_ != 1) || perKeyCurrent.size != 3)
            failure = Some(s"current-row invariant broken: $perKeyCurrent")
        }
      } catch { case e: Throwable => failure = Some(s"reader died: $e") }
    })
    reader.start()
    try {
      Dimensions.scd2MergeCommit(
        spark, t, attrs1, Seq("name"), "k", Seq("name"), FixedClock("2024-07-01 00:00:00"))
    } finally {
      done = true; reader.join(30000)
    }
    assert(failure.isEmpty, failure.getOrElse(""))

    val newSnap = SnapshotStore.read(spark, t)
    assert(newSnap.count() === 6)
    assert(newSnap.filter(col("is_current")).count() === 3)
    assert(newSnap.filter(col("city") === "berlin" && col("is_current")).count() === 1)
    // the previous snapshot is still readable (grace version for pinned readers)
    assert(SnapshotStore.readVersion(spark, t, 0L).collect().toSet === oldRows)
  }

  test("compactCommit rewrites small files into one snapshot-isolated version") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap5").toString
    val t = s"$root/t"
    // many tiny files in the committed snapshot
    SnapshotStore.commit(spark.range(10000).toDF("id").repartition(64), t)
    val (before, after, bytes, v) = graft.ops.Bucketing.compactCommit(spark, t, 1L << 30)
    assert(before === 64 && after === 1 && bytes > 0 && v === 1L)
    assert(SnapshotStore.read(spark, t).count() === 10000)
    assert(SnapshotStore.readVersion(spark, t, 0L).count() === 10000)
  }
}
