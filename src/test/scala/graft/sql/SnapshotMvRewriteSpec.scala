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
