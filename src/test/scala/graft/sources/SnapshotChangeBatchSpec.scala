package graft.sources

import graft.SparkSuite
import graft.store.SnapshotStore
import org.apache.spark.sql.functions._

/** Batch change-feed reads (`table_changes` shape): `spark.read` with
  * `changeFeed=true` + `startingVersion`/`endingVersion` returns the
  * SAME per-version deltas the stream emits — the incremental batch
  * refresh surface, O(delta) per version. */
class SnapshotChangeBatchSpec extends SparkSuite {

  private def freshTable(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def build(table: String): Unit = {
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation, table) // v0: image
    SnapshotStore.appendCommit( // v1: insert delta, 5 rows
      nation.select(col("n_nationkey") + 100, col("n_name"), col("n_regionkey"))
        .toDF("n_nationkey", "n_name", "n_regionkey")
        .filter(col("n_regionkey") === 2).coalesce(1), table)
    val k = SnapshotStore.read(spark, table) // first appended key, data-independent
      .filter(col("n_nationkey") >= 100).agg(min(col("n_nationkey"))).head().getInt(0)
    SnapshotStore.deleteCommit(spark, table, Seq("n_nationkey"), // v2: delete delta
      col("n_nationkey") === k)
  }

  test("batch deltas agree with the stream's, version by version") {
    val table = freshTable("cbatch")
    build(table)

    val batch = spark.read.format("graft-snapshot")
      .option("path", table).option("changeFeed", "true")
      .option("startingVersion", "1").load().collect()

    val q = spark.readStream.format("graft-snapshot")
      .option("path", table).option("changeFeed", "true").load()
      .writeStream.format("memory").queryName("graft_cb_ref").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val stream = spark.table("graft_cb_ref").collect()
      .filter(r => r.getLong(r.fieldIndex("_commit_version")) >= 1L)

    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getLong(r.fieldIndex("_commit_version")),
        r.getString(r.fieldIndex("_change_type")),
        if (r.isNullAt(r.fieldIndex("n_nationkey"))) -1 else r.getInt(r.fieldIndex("n_nationkey")))
    assert(batch.map(keyOf).sorted.toSeq === stream.map(keyOf).sorted.toSeq,
      "batch change feed must replay exactly the stream's deltas")
    assert(batch.count(r => r.getString(r.fieldIndex("_change_type")) == "insert") === 5)
    assert(batch.count(r => r.getString(r.fieldIndex("_change_type")) == "delete") === 1)
  }

  test("endingVersion bounds the range; startingVersion is required") {
    val table = freshTable("cbatch-rng")
    build(table)
    val only1 = spark.read.format("graft-snapshot")
      .option("path", table).option("changeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "1").load().collect()
    assert(only1.length === 5)
    assert(only1.forall(r => r.getString(r.fieldIndex("_change_type")) == "insert"))

    val e = intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("path", table).option("changeFeed", "true").load().collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).mkString(" | ").contains("startingVersion"),
      s"batch change feed without a range must name the missing option: $e")
  }

  test("copy-on-write over LIVE DVs stays a file delta: removes carry live rows only") {
    val wh = java.nio.file.Files.createTempDirectory("cbatch-dvcow").toString
    val table = s"$wh/ns/t"
    val cat = "gcb_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      import spark.implicits._
      val a = Seq((1L, "a1"), (2L, "a2")).toDF("k", "tag")
      val b = Seq((3L, "b3"), (4L, "b4")).toDF("k", "tag")
      SnapshotStore.commit(a.coalesce(1), table)       // v0: file A
      SnapshotStore.appendCommit(b.coalesce(1), table) // v1: file B
      SnapshotStore.deleteCommit(spark, table, Seq("k"), col("k") === 3L) // v2: DV
      spark.sql(s"DELETE FROM $cat.ns.t WHERE k >= 3") // v3: drops file B wholesale
      val v3 = SnapshotStore.manifest(spark, table, 3L)
      assert(v3.op === "delete-files" && v3.deletes.nonEmpty)

      val delta = spark.read.format("graft-snapshot")
        .option("path", table).option("changeFeed", "true")
        .option("startingVersion", "3").load().collect()
      // file B held keys 3 (already DV-dead) and 4 (live): the remove
      // delta must carry ONLY the live row — and never a table image
      assert(delta.length === 1,
        s"cow-over-DVs must emit a file delta, got ${delta.length} rows")
      val r = delta.head
      assert(r.getString(r.fieldIndex("_change_type")) === "remove")
      assert(r.getLong(r.fieldIndex("k")) === 4L)
      assert(r.getLong(r.fieldIndex("_commit_version")) === 3L)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("startingTimestamp resolves to the first commit at/after the instant") {
    val table = freshTable("cbatch-ts")
    build(table)
    val v1ts = SnapshotStore.manifest(spark, table, 1L).ts
    val fromTs = spark.read.format("graft-snapshot")
      .option("path", table).option("changeFeed", "true")
      .option("startingTimestamp", v1ts.toString).load().collect()
    val fromV1 = spark.read.format("graft-snapshot")
      .option("path", table).option("changeFeed", "true")
      .option("startingVersion", "1").load().collect()
    assert(fromTs.length === fromV1.length,
      "timestamp start must resolve to the same range as its version")
    // an instant past the newest commit is loud, not silently empty
    val e = intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("path", table).option("changeFeed", "true")
        .option("startingTimestamp", (System.currentTimeMillis() + 3600000L).toString)
        .load().collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).mkString(" | ").contains("at or after"))
  }

  test("a vacuumed-away range fails loudly, never silently empty") {
    val table = freshTable("cbatch-vac")
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation, table)          // v0
    SnapshotStore.commit(nation.limit(10), table) // v1
    SnapshotStore.commit(nation.limit(5), table)  // v2
    SnapshotStore.commit(nation.limit(2), table)  // v3
    SnapshotStore.vacuum(spark, table, keep = 2)  // v0, v1 gone
    val e = intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("path", table).option("changeFeed", "true")
        .option("startingVersion", "1").load().collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).mkString(" | ").contains("vacuum retention"),
      s"expected the retention guard to fire: $e")
  }
}
