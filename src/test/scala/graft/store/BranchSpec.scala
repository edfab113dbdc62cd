package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Writable BRANCHES (write-audit-publish): a branch forks at main's
  * head as a self-contained snapshot table under `_branches/<name>`
  * (O(1) metadata — its v0 references main's files in place), every
  * existing write surface works against the branch path, and
  * `fastForward` publishes the branch head onto main in one atomic
  * marker rename. Tags stay immutable read pins — untouched. */
class BranchSpec extends SparkSuite {

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("WAP: branch writes are invisible to main until fastForward publishes them") {
    val table = fresh("branch-wap")
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation, table) // main v0

    val br = SnapshotStore.createBranch(spark, table, "audit")
    assert(SnapshotStore.read(spark, br).orderBy("n_nationkey").collect()
      === SnapshotStore.read(spark, table).orderBy("n_nationkey").collect(),
      "a fresh branch reads exactly main's head")

    // WRITE to the branch through the ordinary surfaces: an append and a DV delete
    SnapshotStore.appendCommit(
      nation.select(col("n_nationkey") + 100, col("n_name"), col("n_regionkey"))
        .toDF("n_nationkey", "n_name", "n_regionkey").limit(5), br)
    SnapshotStore.deleteCommit(spark, br, Seq("n_nationkey"), col("n_nationkey") === 3L)

    // AUDIT: branch sees the delta, main does not
    assert(SnapshotStore.read(spark, br).count() === nation.count() + 5 - 1)
    assert(SnapshotStore.read(spark, table).count() === nation.count(),
      "main must not see branch commits")
    assert(SnapshotStore.currentVersion(spark, table) === Some(0L))
    assert(SnapshotStore.branches(spark, table)("audit") === ((2L, 0L)))

    // PUBLISH: one atomic manifest, zero data movement
    val v = SnapshotStore.fastForward(spark, table, "audit")
    assert(v === 1L)
    val main = SnapshotStore.read(spark, table)
    assert(main.count() === nation.count() + 5 - 1)
    assert(main.filter(col("n_nationkey") === 3L).count() === 0L)
    assert(SnapshotStore.manifest(spark, table, 1L).op === "publish")
  }

  test("fastForward REBASES onto a moved main when changes are file-disjoint") {
    val table = fresh("branch-rebase")
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation, table)
    val br = SnapshotStore.createBranch(spark, table, "wip")
    SnapshotStore.appendCommit(
      nation.select(col("n_nationkey") + 100, col("n_name"), col("n_regionkey"))
        .toDF("n_nationkey", "n_name", "n_regionkey").limit(2), br)
    // main takes an APPEND mid-audit: file-disjoint from the branch's
    SnapshotStore.appendCommit(
      nation.select(col("n_nationkey") + 200, col("n_name"), col("n_regionkey"))
        .toDF("n_nationkey", "n_name", "n_regionkey").limit(3), table)
    val v = SnapshotStore.fastForward(spark, table, "wip")
    assert(v === 2L, "the rebase publishes on top of main's new head")
    val got = SnapshotStore.read(spark, table)
    assert(got.count() === nation.count() + 2 + 3,
      "BOTH sides' appends must land — the rebase loses neither")
    assert(got.filter(col("n_nationkey") >= 100 && col("n_nationkey") < 200).count() === 2)
    assert(got.filter(col("n_nationkey") >= 200).count() === 3)
    val m = SnapshotStore.manifest(spark, table, v)
    assert(m.op === "publish" && m.provenance.contains("rebase:0->1"),
      s"the publish records the rebase in provenance: ${m.provenance}")
  }

  test("fastForward still refuses a moved main on overlapping rewrites and on DV changes") {
    val table = fresh("branch-overlap")
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation, table)
    // overlap: BOTH sides compact (rewrite every base file)
    val br = SnapshotStore.createBranch(spark, table, "wip")
    graft.ops.Bucketing.compactCommit(spark, br, 128L * 1024 * 1024)
    graft.ops.Bucketing.compactCommit(spark, table, 128L * 1024 * 1024)
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.fastForward(spark, table, "wip")
    }
    assert(e.getMessage.contains("moved to version") &&
      e.getMessage.contains("audit against a fresh branch"),
      s"both sides rewrote the same files — must refuse: ${e.getMessage}")
    assert(SnapshotStore.currentVersion(spark, table) === Some(1L),
      "a refused publish must not move main")

    // DV change on the branch + a moved main: row-granular, not
    // file-decidable — refuses even though the file sets are disjoint
    val t2 = fresh("branch-dvref")
    SnapshotStore.commit(nation, t2)
    val br2 = SnapshotStore.createBranch(spark, t2, "wip")
    SnapshotStore.deleteCommit(spark, br2, Seq("n_nationkey"), col("n_nationkey") === 3L)
    SnapshotStore.appendCommit(nation.limit(1), t2) // main moves
    val e2 = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.fastForward(spark, t2, "wip")
    }
    assert(e2.getMessage.contains("deletion vectors changed"), e2.getMessage)
  }

  test("withTransaction: N ops, ONE atomic main commit; failure rolls back to nothing") {
    val table = fresh("branch-txn")
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation, table)
    val n0 = nation.count()
    // a "concurrent reader" polls main after every op: version AND
    // content must be the pre-transaction state throughout
    def observed(): (Option[Long], Long) =
      (SnapshotStore.currentVersion(spark, table), SnapshotStore.read(spark, table).count())
    val before = observed()
    val (v, _) = SnapshotStore.withTransaction(spark, table) { br =>
      SnapshotStore.deleteCommit(spark, br, Seq("n_nationkey"), col("n_nationkey") === 3L)
      assert(observed() === before, "intermediate state leaked after op 1")
      SnapshotStore.appendCommit(
        nation.select(col("n_nationkey") + 100, col("n_name"), col("n_regionkey"))
          .toDF("n_nationkey", "n_name", "n_regionkey").limit(5), br)
      assert(observed() === before, "intermediate state leaked after op 2")
      graft.ops.NdvStats.analyzeCommit(spark, br, Seq("n_regionkey"))
      assert(observed() === before, "intermediate state leaked after op 3")
    }
    assert(v === 1L, "the three ops land as ONE main version")
    assert(SnapshotStore.read(spark, table).count() === n0 - 1 + 5)
    assert(SnapshotStore.manifest(spark, table, v).ndvFile.nonEmpty,
      "the analyze publishes with the same commit")

    // FAILURE mid-transaction: main untouched, the staged branch is gone
    // (the SUCCESSFUL transaction's branch stays — main references its
    // published files, dropBranch's guard keeps it)
    val headBefore = SnapshotStore.currentVersion(spark, table)
    val branchesBefore = SnapshotStore.branches(spark, table).keySet
    val boom = intercept[RuntimeException] {
      SnapshotStore.withTransaction(spark, table) { br =>
        SnapshotStore.appendCommit(nation.limit(2), br)
        throw new RuntimeException("boom")
      }
    }
    assert(boom.getMessage === "boom")
    assert(SnapshotStore.currentVersion(spark, table) === headBefore,
      "a failed transaction must not move main")
    assert(SnapshotStore.branches(spark, table).keySet === branchesBefore,
      "the failed transaction's branch must be dropped")

    // a concurrent APPEND mid-transaction: the publish rebases — both land
    val n1 = SnapshotStore.read(spark, table).count()
    val (v2, _) = SnapshotStore.withTransaction(spark, table) { br =>
      SnapshotStore.appendCommit(
        nation.select(col("n_nationkey") + 300, col("n_name"), col("n_regionkey"))
          .toDF("n_nationkey", "n_name", "n_regionkey").limit(2), br)
      SnapshotStore.appendCommit(
        nation.select(col("n_nationkey") + 400, col("n_name"), col("n_regionkey"))
          .toDF("n_nationkey", "n_name", "n_regionkey").limit(1), table) // main moves
    }
    assert(SnapshotStore.read(spark, table).count() === n1 + 3,
      "the transaction's append AND the concurrent main append must both land")
    assert(SnapshotStore.manifest(spark, table, v2).provenance.contains("rebase"),
      "the publish records it rebased")
  }

  test("dropBranch refuses while published main versions reference branch files") {
    val table = fresh("branch-drop")
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation, table)
    val br = SnapshotStore.createBranch(spark, table, "audit")
    SnapshotStore.appendCommit(nation.limit(4), br)
    SnapshotStore.fastForward(spark, table, "audit")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.dropBranch(spark, table, "audit")
    }
    assert(e.getMessage.contains("reference files under"))
    assert(SnapshotStore.read(spark, table).count() === nation.count() + 4,
      "the refused drop must leave published data intact")

    // an UNPUBLISHED branch drops cleanly and main never knew
    SnapshotStore.appendCommit(nation.limit(1), table) // main moves past the base
    val scratch = SnapshotStore.createBranch(spark, table, "scratch")
    SnapshotStore.appendCommit(nation.limit(2), scratch)
    assert(SnapshotStore.dropBranch(spark, table, "scratch"))
    assert(SnapshotStore.branches(spark, table).keySet === Set("audit"))
  }

  test("fastForward publishes srcV = -1 with branch provenance on a dedicated key") {
    val table = fresh("branch-prov")
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation, table)
    val br = SnapshotStore.createBranch(spark, table, "audit")
    SnapshotStore.appendCommit(nation.limit(2), br)
    SnapshotStore.appendCommit(nation.limit(1), br) // branch head = v2
    SnapshotStore.fastForward(spark, table, "audit")
    val m = SnapshotStore.manifest(spark, table, 1L)
    assert(m.op === "publish")
    assert(m.srcV === -1L,
      "a publish must NOT reuse srcV for the branch head — main-head srcV doubles " +
        "as the streaming epoch guard and the mirror cursor")
    assert(m.provenance === "branch:audit@2",
      "branch provenance rides its own marker key instead")
  }

  test("dropBranch protects an NDV sidecar that fastForward published onto main") {
    val table = fresh("branch-ndv")
    val orders = graft.sources.Tables.orders(spark, sf())
    SnapshotStore.commit(orders, table)
    val br = SnapshotStore.createBranch(spark, table, "stats")
    graft.ops.NdvStats.analyzeCommit(spark, br, Seq("o_custkey")) // branch v1: ndvfile under the branch root
    SnapshotStore.fastForward(spark, table, "stats")
    val head = SnapshotStore.manifest(spark, table, 1L)
    assert(head.ndvFile.nonEmpty && head.ndvFile.contains("_branches/stats"),
      s"precondition: main's head references the branch-rooted sidecar (${head.ndvFile})")
    // estimates resolve through the published sidecar
    assert(graft.ops.NdvStats.estimates(spark, head.ndvFile,
      SnapshotStore.dataFiles(spark, head)).contains("o_custkey"))
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.dropBranch(spark, table, "stats")
    }
    assert(e.getMessage.contains("reference files under"),
      "dropping the branch would delete main's live ndv sidecar — must refuse")
    // a full rewrite drops the sidecar reference; once history ages out,
    // the branch releases cleanly
    SnapshotStore.commit(orders.limit(5), table)
    SnapshotStore.vacuum(spark, table, keep = 1)
    assert(SnapshotStore.dropBranch(spark, table, "stats"))
  }

  test("exactly-once streaming sink survives an interleaved WAP publish (epoch guard)") {
    val table = fresh("branch-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("branch-streamck").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    SnapshotStore.commit(spark.range(0).selectExpr("id"), table) // seed schema, v0
    val input = MemoryStream[Long]
    def start() = input.toDF().selectExpr("value AS id")
      .writeStream.format("graft-snapshot").option("path", table)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try {
      input.addData(0L until 10L: _*); q1.processAllAvailable() // epoch 0
      input.addData(10L until 15L: _*); q1.processAllAvailable() // epoch 1
      assert(SnapshotStore.read(spark, table).count() === 15)
    } finally q1.stop()

    // WAP while the stream is down: THREE branch commits so the branch
    // head version number (3) collides with a FUTURE epoch id — the
    // pre-round-14 publish (srcV = branch head) would then silently
    // skip epochs 2 and 3
    val br = SnapshotStore.createBranch(spark, table, "wap")
    (1 to 3).foreach(i =>
      SnapshotStore.appendCommit(spark.range(100L * i, 100L * i + 2).selectExpr("id"), br))
    SnapshotStore.fastForward(spark, table, "wap")
    assert(SnapshotStore.read(spark, table).count() === 21)

    // force an at-least-once REPLAY of epoch 1: drop its commit marker
    // from the checkpoint, so the restarted query re-runs the batch
    val commit1 = java.nio.file.Paths.get(ckpt, "commits", "1")
    assert(java.nio.file.Files.deleteIfExists(commit1), s"missing $commit1")
    // the local checksum FS shadows every log file with a .crc — a
    // stale one would fail the restarted query's atomic rename
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    val q2 = start()
    try {
      q2.processAllAvailable() // replays epoch 1 — the guard must drop it
      assert(SnapshotStore.read(spark, table).count() === 21,
        "a replayed epoch after a WAP publish must not double-append " +
          "(the publish must not reset the epoch cursor)")
      input.addData(15L until 18L: _*); q2.processAllAvailable() // epoch 2
      assert(SnapshotStore.read(spark, table).count() === 24,
        "fresh epochs after the publish must still apply " +
          "(a published branch version must not masquerade as an applied epoch)")
      assert(SnapshotStore.read(spark, table)
        .agg(org.apache.spark.sql.functions.sum(col("id"))).head().getLong(0)
        === (0L until 18L).sum + Seq(100L, 101L, 200L, 201L, 300L, 301L).sum)
    } finally q2.stop()
  }

  test("a branch pins its fork base against main's vacuum") {
    val table = fresh("branch-vac")
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation, table)                    // v0 = fork base
    val br = SnapshotStore.createBranch(spark, table, "longlived")
    SnapshotStore.commit(nation.limit(3), table)           // v1 (rewrite)
    SnapshotStore.commit(nation.limit(2), table)           // v2
    SnapshotStore.commit(nation.limit(1), table)           // v3
    val dropped = SnapshotStore.vacuum(spark, table, keep = 2)
    assert(!dropped.contains(0L), "the branch's fork base must be retention-pinned")
    assert(SnapshotStore.read(spark, br).count() === nation.count(),
      "the branch must stay readable after main's vacuum")
    // releasing the branch releases the pin
    assert(SnapshotStore.dropBranch(spark, table, "longlived"))
    assert(SnapshotStore.vacuum(spark, table, keep = 2).contains(0L))
  }

  test("SQL procedures: create_branch / fast_forward / drop_branch; empty publish is a no-op") {
    val wh = java.nio.file.Files.createTempDirectory("branch-sql").toString
    val cat = "gbr_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      val table = s"$wh/dims/nation"
      val nation = graft.sources.Tables.nation(spark, sf())
      SnapshotStore.commit(nation, table)
      val br = spark.sql(s"CALL $cat.system.create_branch('dims.nation', 'wap')")
        .head().getString(0)
      assert(br.endsWith("_branches/wap"))
      // empty branch: publishing is a no-op at the fork base
      assert(spark.sql(s"CALL $cat.system.fast_forward('dims.nation', 'wap')")
        .head().getLong(0) === 0L)
      SnapshotStore.appendCommit(nation.limit(3), br)
      assert(spark.sql(s"CALL $cat.system.fast_forward('dims.nation', 'wap')")
        .head().getLong(0) === 1L)
      assert(spark.sql(s"SELECT count(*) FROM $cat.dims.nation").head().getLong(0)
        === nation.count() + 3)
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.drop_branch('dims.nation', 'wap')").collect()
      }
      def chain(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
      assert(chain(e).exists(_.contains("reference files under")))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("branches are first-class catalog tables: the WAP flow in pure SQL") {
    val wh = java.nio.file.Files.createTempDirectory("branch-cat").toString
    val cat = "gbc_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      val nation = graft.sources.Tables.nation(spark, sf())
      SnapshotStore.commit(nation, s"$wh/dims/nation")
      spark.sql(s"CALL $cat.system.create_branch('dims.nation', 'audit')")
      // WRITE to the branch in SQL
      spark.sql(
        s"""INSERT INTO $cat.dims.`nation$$branch$$audit`
            SELECT n_nationkey + 500, n_name, n_regionkey FROM $cat.dims.nation LIMIT 4""")
      // AUDIT in SQL: the branch sees the delta, main does not
      assert(spark.sql(s"SELECT count(*) FROM $cat.dims.`nation$$branch$$audit`")
        .head().getLong(0) === nation.count() + 4)
      assert(spark.sql(s"SELECT count(*) FROM $cat.dims.nation").head().getLong(0)
        === nation.count())
      // PUBLISH in SQL
      spark.sql(s"CALL $cat.system.fast_forward('dims.nation', 'audit')")
      assert(spark.sql(s"SELECT count(*) FROM $cat.dims.nation").head().getLong(0)
        === nation.count() + 4)
      // unknown branch refuses like any missing table
      intercept[Exception](
        spark.sql(s"SELECT * FROM $cat.dims.`nation$$branch$$ghost`").collect())
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }
}
