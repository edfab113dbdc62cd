package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.ChangeData
import graft.store.SnapshotStore

/** Incrementally-maintained MVs ([[SnapshotMv]]): every refresh mode
  * must land on EXACTLY the state a from-scratch rebuild computes —
  * the canonical oracle is `aggState(base@head)` — while the result
  * metadata proves which path (algebraic, bound-hit recompute, full
  * fallback) produced it. */
class SnapshotMvSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(kind: String): String =
    java.nio.file.Files.createTempDirectory(kind).toString

  private def baseRows(rows: (Int, String, Long)*): DataFrame =
    rows.toDF("id", "grp", "cents")

  private def canonical(table: String): DataFrame =
    ChangeData.aggState(
      SnapshotStore.read(spark, table), Seq("grp"), Seq("cents"))

  private def assertMvEquals(mv: String, base: String): Unit = {
    val got = SnapshotStore.read(spark, mv)
      .orderBy("grp").collect().map(_.toSeq).toSeq
    val want = canonical(base)
      .select(col("grp"), col("n"), col("sum_cents"), col("cnt_cents"),
        col("min_cents"), col("max_cents"))
      .orderBy("grp").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("create builds the full state and records the reflected version") {
    val root = tmp("mvcreate")
    val base = s"$root/t"; val mv = s"$root/mv"
    SnapshotStore.commit(
      baseRows((1, "a", 10L), (2, "a", 20L), (3, "b", 5L)), base)
    val r = SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))
    assert(r.mode === "full" && r.toVersion === 0L)
    assert(SnapshotMv.meta(spark, mv).get.baseVersion === 0L)
    assertMvEquals(mv, base)
  }

  test("append-only refresh is incremental with zero recomputed groups") {
    val root = tmp("mvappend")
    val base = s"$root/t"; val mv = s"$root/mv"
    SnapshotStore.commit(baseRows((1, "a", 10L), (2, "b", 5L)), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))
    SnapshotStore.appendCommit(
      baseRows((3, "a", 7L), (4, "c", 99L)), base) // existing + new group
    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "incremental" && r.recomputedGroups === 0L)
    assertMvEquals(mv, base)
    // new group c appeared, group a merged algebraically (7 < 10 moves
    // min via least(), which needs no recompute)
    val a = SnapshotStore.read(spark, mv).filter($"grp" === "a").collect().head
    assert(a.getAs[Long]("n") === 2L && a.getAs[Long]("min_cents") === 7L)
  }

  test("noop refresh changes nothing") {
    val root = tmp("mvnoop")
    val base = s"$root/t"; val mv = s"$root/mv"
    SnapshotStore.commit(baseRows((1, "a", 10L)), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))
    val before = SnapshotStore.currentVersion(spark, mv).get
    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "noop")
    assert(SnapshotStore.currentVersion(spark, mv).get === before)
  }

  test("MoR delete of an interior value stays algebraic; deleting the min recomputes") {
    val root = tmp("mvdelete")
    val base = s"$root/t"; val mv = s"$root/mv"
    // group a: 10 (min), 20, 30 (max); group b untouched
    SnapshotStore.commit(
      baseRows((1, "a", 10L), (2, "a", 20L), (3, "a", 30L), (4, "b", 5L)), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))

    // interior delete: id=2 (value 20, strictly inside the bounds)
    SnapshotStore.deleteKeysCommit(spark, base, Seq("id"), Seq(2).toDF("id"))
    val r1 = SnapshotMv.refresh(spark, mv)
    assert(r1.mode === "incremental" && r1.recomputedGroups === 0L,
      s"interior removal must not recompute, got $r1")
    assertMvEquals(mv, base)

    // bound delete: id=1 (value 10 ties the min) — exactly one group recomputes
    SnapshotStore.deleteKeysCommit(spark, base, Seq("id"), Seq(1).toDF("id"))
    val r2 = SnapshotMv.refresh(spark, mv)
    assert(r2.mode === "incremental" && r2.recomputedGroups === 1L,
      s"bound removal must recompute its group, got $r2")
    assertMvEquals(mv, base)
    val a = SnapshotStore.read(spark, mv).filter($"grp" === "a").collect().head
    assert(a.getAs[Long]("min_cents") === 30L && a.getAs[Long]("n") === 1L)
  }

  test("a group whose last row is deleted vanishes from the MV") {
    val root = tmp("mvvanish")
    val base = s"$root/t"; val mv = s"$root/mv"
    SnapshotStore.commit(baseRows((1, "a", 10L), (2, "b", 5L)), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))
    SnapshotStore.deleteKeysCommit(spark, base, Seq("id"), Seq(2).toDF("id"))
    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "incremental")
    assert(SnapshotStore.read(spark, mv).filter($"grp" === "b").count() === 0L)
    assertMvEquals(mv, base)
  }

  test("CoW MERGE (row-changes sidecar) folds updates incrementally") {
    val root = tmp("mvmerge")
    val wh = s"$root/wh"
    val cat = "gmvtest"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val base = s"$wh/facts/t"; val mv = s"$root/mv"
    SnapshotStore.commit(
      baseRows((1, "a", 10L), (2, "a", 20L), (3, "b", 5L), (4, "b", 50L)), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))

    Seq((2, 25L), (5, 60L)).toDF("id", "delta")
      .createOrReplaceTempView("mv_merge_src")
    spark.sql(
      s"""MERGE INTO $cat.facts.t t USING mv_merge_src s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET cents = t.cents + s.delta
          WHEN NOT MATCHED THEN INSERT (id, grp, cents) VALUES (s.id, 'b', s.delta)""")
    val m = SnapshotStore.manifest(spark, base,
      SnapshotStore.currentVersion(spark, base).get)
    assert(m.rowChanges.nonEmpty, "the CoW merge must publish a row-changes sidecar")

    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "incremental")
    assertMvEquals(mv, base)
    // a: 10, 45 → sum 55; b: 5, 50, 60 → sum 115, max moved to 60
    val rows = SnapshotStore.read(spark, mv).orderBy("grp").collect()
    assert(rows.map(_.getAs[Long]("sum_cents")).toSeq === Seq(55L, 115L))
    assert(rows(1).getAs[Long]("max_cents") === 60L)
  }

  test("a full restatement falls back to one rebuild") {
    val root = tmp("mvrestate")
    val base = s"$root/t"; val mv = s"$root/mv"
    SnapshotStore.commit(baseRows((1, "a", 10L)), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))
    SnapshotStore.commit(baseRows((7, "z", 1L), (8, "z", 2L)), base) // restate
    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "full")
    assertMvEquals(mv, base)
  }

  test("null group keys survive the merge") {
    val root = tmp("mvnull")
    val base = s"$root/t"; val mv = s"$root/mv"
    Seq((1, Option("a"), 10L), (2, Option.empty[String], 5L))
      .toDF("id", "grp", "cents").pipe(SnapshotStore.commit(_, base))
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))
    SnapshotStore.appendCommit(
      Seq((3, Option.empty[String], 7L)).toDF("id", "grp", "cents"), base)
    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "incremental")
    val nullGrp = SnapshotStore.read(spark, mv).filter($"grp".isNull).collect()
    assert(nullGrp.length === 1 && nullGrp.head.getAs[Long]("n") === 2L)
    assertMvEquals(mv, base)
  }

  test("refresh folds a multi-version range (append + delete + merge) in one pass") {
    val root = tmp("mvrange")
    val wh = s"$root/wh"
    val cat = "gmvrange"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val base = s"$wh/facts/t"; val mv = s"$root/mv"
    SnapshotStore.commit(
      baseRows((1, "a", 10L), (2, "a", 20L), (3, "b", 5L)), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))

    SnapshotStore.appendCommit(baseRows((4, "c", 40L)), base)       // v1
    SnapshotStore.deleteKeysCommit(spark, base, Seq("id"), Seq(3).toDF("id")) // v2
    Seq((1, 100L)).toDF("id", "delta").createOrReplaceTempView("mv_range_src")
    spark.sql(
      s"""MERGE INTO $cat.facts.t t USING mv_range_src s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET cents = t.cents + s.delta""") // v3
    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "incremental" && r.fromVersion === 0L && r.toVersion === 3L)
    assertMvEquals(mv, base)
  }

  test("group/measure names colliding with the state schema are refused at create") {
    val root = tmp("mvreserved")
    val base = s"$root/t"
    SnapshotStore.commit(
      Seq((1L, "a", 10L)).toDF("n", "grp", "cents"), base)
    // group column literally named "n" collides with the row counter
    val e1 = intercept[IllegalArgumentException] {
      SnapshotMv.create(spark, base, s"$root/mv1", Seq("n"), Seq("cents"))
    }
    assert(e1.getMessage.contains("collide"))
    // a group column named like a measure's derived state column
    SnapshotStore.commit(
      Seq((1L, "a", 10L)).toDF("sum_cents", "grp", "cents"), s"$root/t2")
    val e2 = intercept[IllegalArgumentException] {
      SnapshotMv.create(spark, s"$root/t2", s"$root/mv2", Seq("sum_cents"), Seq("cents"))
    }
    assert(e2.getMessage.contains("collide"))
    // duplicate columns across the two lists
    val e3 = intercept[IllegalArgumentException] {
      SnapshotMv.create(spark, base, s"$root/mv3", Seq("grp"), Seq("grp"))
    }
    assert(e3.getMessage.contains("distinct"))
  }

  test("a lost sidecar write heals from the MV commit's own cursor — no double fold") {
    val root = tmp("mvheal")
    val base = s"$root/t"; val mv = s"$root/mv"
    SnapshotStore.commit(baseRows((1, "a", 10L), (2, "b", 5L)), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))
    SnapshotStore.appendCommit(baseRows((3, "a", 7L)), base)
    assert(SnapshotMv.refresh(spark, mv).mode === "incremental")
    // simulate the crash window: the MV commit landed (its manifest
    // carries src=1) but the sidecar write was lost — regress it to 0
    val sidecar = new java.io.File(mv, "_mv")
    val stale = new String(
      java.nio.file.Files.readAllBytes(sidecar.toPath), "UTF-8")
      .replace("version=1", "version=0")
    java.nio.file.Files.write(sidecar.toPath, stale.getBytes("UTF-8"))
    // the raw rewrite bypassed Hadoop's ChecksumFileSystem — drop the
    // now-stale CRC sidecar so the next read doesn't fail on it
    new java.io.File(mv, "._mv.crc").delete()
    assert(SnapshotMv.meta(spark, mv).get.baseVersion === 0L)
    // refresh must heal from the commit cursor and NOT re-fold (0,1]:
    // re-applying the insert would double group a's n/sum
    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "noop", s"healed refresh must be a noop, was ${r.mode}")
    assert(SnapshotMv.meta(spark, mv).get.baseVersion === 1L)
    assertMvEquals(mv, base)
    // and the next REAL change still folds once
    SnapshotStore.appendCommit(baseRows((4, "b", 2L)), base)
    assert(SnapshotMv.refresh(spark, mv).mode === "incremental")
    assertMvEquals(mv, base)
  }

  test("a live column rename declines the feed and falls back to one full rebuild") {
    val root = tmp("mvrename")
    val base = s"$root/t"; val mv = s"$root/mv"
    SnapshotStore.commit(baseRows((1, "a", 10L), (2, "b", 5L)), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))
    // rename a column the MV does not touch: the change feed refuses
    // ANY read under live renames (at action time, not load time), but
    // the full-rebuild path reads logical names and works
    SnapshotStore.renameColumnCommit(spark, base, "id", "row_id")
    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "full", s"rename must fall back to a rebuild, was ${r.mode}")
    assert(SnapshotMv.meta(spark, mv).get.baseVersion === 1L)
    assertMvEquals(mv, base)
  }

  implicit private class Pipe[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
