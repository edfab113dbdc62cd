package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.ChangeData
import graft.store.SnapshotStore

/** JOIN MVs ([[SnapshotMv.createJoin]]): the summary of `fact ⋈ dims`
  * maintained from FACT deltas enriched through PINNED dim versions.
  * Oracle per test: `aggState(fact@head ⋈ dims@pinned)` rebuilt from
  * scratch — every refresh mode must land exactly there. */
class SnapshotMvJoinSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(kind: String): String =
    java.nio.file.Files.createTempDirectory(kind).toString

  private def facts(rows: (Int, Int, Long)*): DataFrame =
    rows.toDF("id", "cust", "cents")

  private def dims(rows: (Int, String)*): DataFrame =
    rows.toDF("c_id", "segment")

  private def dimOf(table: String) = MaterializedAgg.MvDim(
    table, factKeys = Seq("cust"), dimKeys = Seq("c_id"), attrs = Seq("segment"))

  /** From-scratch oracle at the CURRENT fact head and the dim versions
    * the sidecar pins. */
  private def assertMvEquals(mv: String, base: String): Unit = {
    val m = SnapshotMv.meta(spark, mv).get
    val enriched = m.dims.foldLeft(SnapshotStore.read(spark, base)) { (acc, p) =>
      val d = SnapshotStore.readVersion(spark, p.dim.table, p.version)
      acc.join(d, acc(p.dim.factKeys.head) === d(p.dim.dimKeys.head), "inner")
        .select(acc.columns.map(acc(_)) ++ p.dim.attrs.map(d(_)): _*)
    }
    val want = ChangeData.aggState(enriched, m.groupCols, m.measureCols)
      .select(col("segment"), col("n"), col("sum_cents"), col("cnt_cents"),
        col("min_cents"), col("max_cents"))
      .orderBy("segment").collect().map(_.toSeq).toSeq
    val got = SnapshotStore.read(spark, mv)
      .orderBy("segment").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("createJoin builds the joined state and pins dim versions") {
    val root = tmp("mvjcreate")
    val base = s"$root/f"; val dim = s"$root/d"; val mv = s"$root/mv"
    SnapshotStore.commit(facts((1, 10, 100L), (2, 10, 50L), (3, 20, 7L)), base)
    SnapshotStore.commit(dims((10, "A"), (20, "B"), (30, "C")), dim)
    val r = SnapshotMv.createJoin(spark, base, mv,
      Seq(dimOf(dim)), Seq("segment"), Seq("cents"))
    assert(r.mode === "full")
    val m = SnapshotMv.meta(spark, mv).get
    assert(m.dims.map(p => (p.dim.table, p.version)) === Seq((dim, 0L)))
    assertMvEquals(mv, base)
    // only joined segments appear (C has no facts), inner-join semantics
    val segs = SnapshotStore.read(spark, mv).select("segment")
      .collect().map(_.getString(0)).toSet
    assert(segs === Set("A", "B"))
  }

  test("fact-only changes fold incrementally through the pinned dim") {
    val root = tmp("mvjfold")
    val base = s"$root/f"; val dim = s"$root/d"; val mv = s"$root/mv"
    SnapshotStore.commit(facts((1, 10, 100L), (2, 20, 50L)), base)
    SnapshotStore.commit(dims((10, "A"), (20, "B")), dim)
    SnapshotMv.createJoin(spark, base, mv,
      Seq(dimOf(dim)), Seq("segment"), Seq("cents"))
    // append: new fact rows, one to a fresh segment-path and one
    // unjoinable (cust 99) that must NOT appear in the state
    SnapshotStore.appendCommit(facts((3, 10, 30L), (4, 99, 999L)), base)
    val r1 = SnapshotMv.refresh(spark, mv)
    assert(r1.mode === "incremental" && r1.recomputedGroups === 0L)
    assertMvEquals(mv, base)
    val a = SnapshotStore.read(spark, mv).filter($"segment" === "A").head()
    assert(a.getAs[Long]("n") === 2L && a.getAs[Long]("sum_cents") === 130L)
    // MoR delete of the segment-A minimum: pre-image fetch + enrich +
    // bound-hit recompute of that one group
    SnapshotStore.deleteKeysCommit(spark, base, Seq("id"), Seq(3).toDF("id"))
    val r2 = SnapshotMv.refresh(spark, mv)
    assert(r2.mode === "incremental" && r2.recomputedGroups === 1L)
    assertMvEquals(mv, base)
  }

  test("a moved dim forces one full rebuild that re-pins") {
    val root = tmp("mvjdim")
    val base = s"$root/f"; val dim = s"$root/d"; val mv = s"$root/mv"
    SnapshotStore.commit(facts((1, 10, 100L), (2, 20, 50L)), base)
    SnapshotStore.commit(dims((10, "A"), (20, "B")), dim)
    SnapshotMv.createJoin(spark, base, mv,
      Seq(dimOf(dim)), Seq("segment"), Seq("cents"))
    // dim restated: cust 20 moves from B to B2 — delta algebra over the
    // fact feed cannot see this; refresh must rebuild even though the
    // FACT never moved
    SnapshotStore.commit(dims((10, "A"), (20, "B2")), dim)
    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "full")
    assert(SnapshotMv.meta(spark, mv).get.dims.head.version === 1L)
    assertMvEquals(mv, base)
    val segs = SnapshotStore.read(spark, mv).select("segment")
      .collect().map(_.getString(0)).toSet
    assert(segs === Set("A", "B2"))
    // and fact deltas fold incrementally against the NEW pin afterwards
    SnapshotStore.appendCommit(facts((3, 20, 1L)), base)
    assert(SnapshotMv.refresh(spark, mv).mode === "incremental")
    assertMvEquals(mv, base)
  }

  test("createJoin validations: dim-sourced measures, attr collisions, missing keys") {
    val root = tmp("mvjval")
    val base = s"$root/f"; val dim = s"$root/d"
    SnapshotStore.commit(facts((1, 10, 100L)), base)
    SnapshotStore.commit(dims((10, "A")), dim)
    val e1 = intercept[IllegalArgumentException] {
      SnapshotMv.createJoin(spark, base, s"$root/mv1",
        Seq(dimOf(dim)), Seq("segment"), Seq("segment")) // measure from dim
    }
    assert(e1.getMessage.contains("distinct") || e1.getMessage.contains("FACT"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotMv.createJoin(spark, base, s"$root/mv2",
        Seq(MaterializedAgg.MvDim(dim, Seq("cust"), Seq("c_id"), Seq("cents"))),
        Seq("cents"), Seq("id")) // dim attr collides with a fact column
    }
    assert(e2.getMessage.contains("collide"))
    val e3 = intercept[IllegalArgumentException] {
      SnapshotMv.createJoin(spark, base, s"$root/mv3",
        Seq(MaterializedAgg.MvDim(dim, Seq("nope"), Seq("c_id"), Seq("segment"))),
        Seq("segment"), Seq("cents"))
    }
    assert(e3.getMessage.contains("missing join key"))
  }

  test("sidecar dims round-trip through the save/load registry codec") {
    val d = Seq(
      MaterializedAgg.MvDim("/w/d one", Seq("a", "b"), Seq("x", "y"), Seq("s;t", "u|v")),
      MaterializedAgg.MvDim("/w/d2", Seq("k"), Seq("k"), Nil))
    assert(MaterializedAgg.decodeDims(MaterializedAgg.encodeDims(d)) === d)
  }
}
