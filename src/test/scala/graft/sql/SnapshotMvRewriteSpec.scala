package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.SnapshotScanProbe
import graft.store.SnapshotStore

/** Transparent rewrite onto an incrementally-maintained snapshot MV
  * ([[SnapshotMv.register]] + the DSv2 branch of
  * [[graft.plans.AggMvRewriteRule]]): the rewrite must fire exactly
  * when the MV provably reflects the manifest the scan pinned —
  * fresh MV rewrites, stale MV scans the base (correctness over
  * speed), refreshed MV rewrites again. */
class SnapshotMvRewriteSpec extends SparkSuite {
  import spark.implicits._

  private def dsv2(table: String): DataFrame =
    spark.read.format("graft-snapshot").option("path", table).load()

  /** Table paths of every snapshot scan in the OPTIMIZED plan. */
  private def scannedTables(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case sr: DataSourceV2ScanRelation =>
        SnapshotScanProbe.rewriteTarget(sr.scan).map(_._1)
    }.flatten

  private def agg(df: DataFrame): DataFrame =
    df.groupBy($"grp").agg(
      count(lit(1)).alias("n_rows"),
      sum($"cents").alias("total"),
      min($"cents").alias("lo"),
      max($"cents").alias("hi"))
      .orderBy($"grp")

  test("fresh MV rewrites the aggregate; stale MV does not; refresh re-arms it") {
    MaterializedAgg.clear()
    val root = java.nio.file.Files.createTempDirectory("mvrw").toString
    val base = s"$root/t"; val mv = s"$root/mv"
    SnapshotStore.commit(
      Seq((1, "a", 10L), (2, "a", 20L), (3, "b", 5L))
        .toDF("id", "grp", "cents"), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents")) // auto-registers

    val q1 = agg(dsv2(base))
    assert(scannedTables(q1) === Seq(mv),
      s"fresh MV must replace the base scan, got ${scannedTables(q1)}")
    assert(q1.collect().map(_.toSeq).toSeq ===
      Seq(Seq("a", 2L, 30L, 10L, 20L), Seq("b", 1L, 5L, 5L, 5L)))

    // base advances; the MV is now STALE — the scan must stay on base
    SnapshotStore.appendCommit(Seq((4, "b", 50L)).toDF("id", "grp", "cents"), base)
    val q2 = agg(dsv2(base))
    assert(scannedTables(q2) === Seq(base),
      "a stale MV must never serve a rewritten (wrong) answer")
    assert(q2.collect().map(_.toSeq).toSeq ===
      Seq(Seq("a", 2L, 30L, 10L, 20L), Seq("b", 2L, 55L, 5L, 50L)))

    // one incremental refresh re-arms the rewrite, with the new rows
    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "incremental")
    val q3 = agg(dsv2(base))
    assert(scannedTables(q3) === Seq(mv))
    assert(q3.collect().map(_.toSeq).toSeq ===
      Seq(Seq("a", 2L, 30L, 10L, 20L), Seq("b", 2L, 55L, 5L, 50L)))
  }

  test("a group-column filter above the scan survives onto the MV") {
    MaterializedAgg.clear()
    val root = java.nio.file.Files.createTempDirectory("mvrwf").toString
    val base = s"$root/t"; val mv = s"$root/mv"
    SnapshotStore.commit(
      Seq((1, "a", 10L), (2, "b", 20L), (3, "c", 30L))
        .toDF("id", "grp", "cents"), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))
    val q = agg(dsv2(base).filter($"grp" =!= "b"))
    assert(scannedTables(q) === Seq(mv))
    assert(q.collect().map(_.toSeq).toSeq ===
      Seq(Seq("a", 1L, 10L, 10L, 10L), Seq("c", 1L, 30L, 30L, 30L)))
  }

  test("a metadata-only base advance re-arms via the sidecar-only refresh") {
    MaterializedAgg.clear()
    val root = java.nio.file.Files.createTempDirectory("mvrwmeta").toString
    val base = s"$root/t"; val mv = s"$root/mv"
    SnapshotStore.commit(
      Seq((1, "a", 10L), (2, "b", 20L)).toDF("id", "grp", "cents"), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))
    // ANALYZE commits a new base version with identical data; the scan
    // now pins that manifest, so the MV (reflecting v0) stops matching
    graft.ops.NdvStats.analyzeCommit(spark, base, Seq("grp"))
    assert(scannedTables(agg(dsv2(base))) === Seq(base))
    // the sidecar-only refresh (no MV commit — nothing to fold) must
    // re-arm the rewrite: freshness here comes from the sidecar, which
    // is AHEAD of the MV head's own commit cursor
    val r = SnapshotMv.refresh(spark, mv)
    assert(r.mode === "incremental")
    val mvHead = SnapshotStore.currentVersion(spark, mv).get
    assert(SnapshotStore.manifest(spark, mv, mvHead).srcV === 0L,
      "a sidecar-only refresh must not commit a new MV version")
    val q = agg(dsv2(base))
    assert(scannedTables(q) === Seq(mv))
    assert(q.collect().map(_.toSeq).toSeq ===
      Seq(Seq("a", 1L, 10L, 10L, 10L), Seq("b", 1L, 20L, 20L, 20L)))
  }

  test("an aggregate over fact ⋈ dim rewrites onto a fresh JOIN MV") {
    MaterializedAgg.clear()
    val root = java.nio.file.Files.createTempDirectory("mvrwj").toString
    val base = s"$root/f"; val dim = s"$root/d"; val mv = s"$root/mv"
    SnapshotStore.commit(
      Seq((1, 10, 100L), (2, 10, 50L), (3, 20, 7L), (4, 99, 1L))
        .toDF("id", "cust", "cents"), base)
    SnapshotStore.commit(
      Seq((10, "A"), (20, "B")).toDF("c_id", "segment"), dim)
    SnapshotMv.createJoin(spark, base, mv,
      Seq(MaterializedAgg.MvDim(dim, Seq("cust"), Seq("c_id"), Seq("segment"))),
      Seq("segment"), Seq("cents"))

    def joined: DataFrame = {
      val f = dsv2(base); val d = dsv2(dim)
      f.join(d, f("cust") === d("c_id"))
        .groupBy($"segment")
        .agg(count(lit(1)).alias("n_rows"), sum($"cents").alias("total"),
          min($"cents").alias("lo"), max($"cents").alias("hi"))
        .orderBy($"segment")
    }
    val q1 = joined
    assert(scannedTables(q1) === Seq(mv),
      s"fresh join MV must replace the join, got ${scannedTables(q1)}")
    assert(q1.collect().map(_.toSeq).toSeq ===
      Seq(Seq("A", 2L, 150L, 50L, 100L), Seq("B", 1L, 7L, 7L, 7L)))

    // a BARE aggregate over the fact must NOT use the join MV (the join
    // changes multiplicity: cust 99 never joined)
    val bare = dsv2(base).groupBy($"cust").agg(sum($"cents").alias("total"))
    assert(scannedTables(bare) === Seq(base))
    assert(bare.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ===
      Set((10, 150L), (20, 7L), (99, 1L)))

    // fact advances → stale → scans base; refresh re-arms
    SnapshotStore.appendCommit(Seq((5, 20, 3L)).toDF("id", "cust", "cents"), base)
    assert(scannedTables(joined).toSet === Set(base, dim))
    assert(SnapshotMv.refresh(spark, mv).mode === "incremental")
    val q2 = joined
    assert(scannedTables(q2) === Seq(mv))
    assert(q2.collect().map(_.toSeq).toSeq ===
      Seq(Seq("A", 2L, 150L, 50L, 100L), Seq("B", 2L, 10L, 3L, 7L)))

    // dim advances → stale (dim pin mismatch) → scans base until refresh
    SnapshotStore.commit(Seq((10, "A"), (20, "B2")).toDF("c_id", "segment"), dim)
    assert(scannedTables(joined).toSet === Set(base, dim))
    assert(SnapshotMv.refresh(spark, mv).mode === "full") // re-pins
    val q3 = joined
    assert(scannedTables(q3) === Seq(mv))
    assert(q3.collect().map(_.toSeq).toSeq ===
      Seq(Seq("A", 2L, 150L, 50L, 100L), Seq("B2", 2L, 10L, 3L, 7L)))
  }

  test("a dim-attr filter over the join survives onto the MV; key filters block") {
    MaterializedAgg.clear()
    val root = java.nio.file.Files.createTempDirectory("mvrwjf").toString
    val base = s"$root/f"; val dim = s"$root/d"; val mv = s"$root/mv"
    SnapshotStore.commit(
      Seq((1, 10, 100L), (2, 20, 7L), (3, 30, 2L)).toDF("id", "cust", "cents"), base)
    SnapshotStore.commit(
      Seq((10, "A"), (20, "B"), (30, "C")).toDF("c_id", "segment"), dim)
    SnapshotMv.createJoin(spark, base, mv,
      Seq(MaterializedAgg.MvDim(dim, Seq("cust"), Seq("c_id"), Seq("segment"))),
      Seq("segment"), Seq("cents"))
    val f = dsv2(base); val d = dsv2(dim)
    val q = f.join(d, f("cust") === d("c_id"))
      .filter($"segment" =!= "B")
      .groupBy($"segment").agg(sum($"cents").alias("total"))
      .orderBy($"segment")
    assert(scannedTables(q) === Seq(mv),
      s"group-attr filter must survive onto the MV, got ${scannedTables(q)}")
    assert(q.collect().map(_.toSeq).toSeq === Seq(Seq("A", 100L), Seq("C", 2L)))
    // a filter on the JOIN KEY is not answerable from group state
    val f2 = dsv2(base); val d2 = dsv2(dim)
    val qk = f2.join(d2, f2("cust") === d2("c_id"))
      .filter(f2("cust") > 15)
      .groupBy($"segment").agg(sum($"cents").alias("total"))
    assert(scannedTables(qk).toSet === Set(base, dim))
    assert(qk.collect().map(_.toSeq).toSet === Set(Seq("B", 7L), Seq("C", 2L)))
  }

  test("a measure-column filter blocks the rewrite (residual filters always survive)") {
    MaterializedAgg.clear()
    val root = java.nio.file.Files.createTempDirectory("mvrwm").toString
    val base = s"$root/t"; val mv = s"$root/mv"
    SnapshotStore.commit(
      Seq((1, "a", 10L), (2, "a", 20L)).toDF("id", "grp", "cents"), base)
    SnapshotMv.create(spark, base, mv, Seq("grp"), Seq("cents"))
    val q = agg(dsv2(base).filter($"cents" > 15L))
    assert(scannedTables(q) === Seq(base),
      "a filter on a measure column cannot be answered from group state")
    assert(q.collect().map(_.toSeq).toSeq === Seq(Seq("a", 1L, 20L, 20L, 20L)))
  }
}
