package graft.ops

import graft.SparkSuite
import graft.store.SnapshotStore
import org.apache.spark.sql.functions._

/** DV-density-aware compaction scheduling ([[Maintenance.run]] /
  * `CALL system.maintenance`): the read-side complement of
  * merge-on-read — a table whose deletion vectors cross the density
  * bound self-heals through the compacting rewrite; below the bound
  * nothing moves. The check is metadata-only. */
class MaintenanceSpec extends SparkSuite {

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("a MoR-heavy table self-heals: density above the bound triggers compaction") {
    val table = fresh("maint")
    val orders = graft.sources.Tables.orders(spark, sf())
    SnapshotStore.commit(orders.repartition(4), table)
    // delete ~20% of rows as DV keys — density 0.2 > the 0.1 default
    SnapshotStore.deleteCommit(spark, table, Seq("o_orderkey"),
      pmod(col("o_orderkey"), lit(5)) === 0)
    val want = SnapshotStore.read(spark, table)
      .agg(count(lit(1)), sum("o_orderkey")).collect()(0)

    val r = Maintenance.run(spark, table)
    assert(r.density > 0.1 && r.action.startsWith("compacted"), s"unexpected receipt: $r")
    val head = SnapshotStore.manifest(spark, table,
      SnapshotStore.currentVersion(spark, table).get)
    assert(head.deletes.isEmpty, "compaction must materialize every DV away")
    assert(head.op === "compact", "the receipt lands in history as the compaction op")
    assert(SnapshotStore.read(spark, table)
      .agg(count(lit(1)), sum("o_orderkey")).collect()(0) === want,
      "self-healing must not change answers")

    // second run: healthy table, no action, same version
    val r2 = Maintenance.run(spark, table)
    assert(r2.action.startsWith("none") && r2.version === r.version)
  }

  test("density below the bound leaves the table untouched") {
    val table = fresh("maint-low")
    val orders = graft.sources.Tables.orders(spark, sf())
    SnapshotStore.commit(orders, table)
    SnapshotStore.deleteCommit(spark, table, Seq("o_orderkey"),
      pmod(col("o_orderkey"), lit(100)) === 0) // ~1%
    val v = SnapshotStore.currentVersion(spark, table).get
    val r = Maintenance.run(spark, table)
    assert(r.action.startsWith("none") && r.version === v)
    assert(r.density > 0.0 && r.density < 0.05, s"unexpected density: $r")
    assert(SnapshotStore.manifest(spark, table, v).deletes.nonEmpty,
      "a healthy table's DVs stay")
  }

  test("CALL system.maintenance returns the receipt and compacts through SQL") {
    val wh = java.nio.file.Files.createTempDirectory("maint-sql").toString
    val cat = "gmt_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      val table = s"$wh/facts/orders"
      val orders = graft.sources.Tables.orders(spark, sf())
      SnapshotStore.commit(orders, table)
      SnapshotStore.deleteCommit(spark, table, Seq("o_orderkey"),
        pmod(col("o_orderkey"), lit(4)) === 0) // 25%
      val row = spark.sql(
        s"CALL $cat.system.maintenance('facts.orders', max_dv_ratio => 0.2)").head()
      assert(row.getString(3).startsWith("compacted"), s"receipt: $row")
      assert(row.getDouble(2) > 0.2)
      assert(spark.sql(s"SELECT count(*) FROM $cat.facts.orders").head().getLong(0)
        === orders.filter(pmod(col("o_orderkey"), lit(4)) =!= 0).count())
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("maintenance refreshes NDV coverage after the self-heal rewrite") {
    val table = fresh("maint-ndv")
    val orders = graft.sources.Tables.orders(spark, sf())
    SnapshotStore.commit(orders, table)
    NdvStats.analyzeCommit(spark, table, Seq("o_custkey"))
    SnapshotStore.deleteCommit(spark, table, Seq("o_orderkey"),
      pmod(col("o_orderkey"), lit(4)) === 0) // 25% > bound
    val r = Maintenance.run(spark, table, maxDvRatio = 0.2)
    assert(r.action.contains("NDV re-analyzed: o_custkey"), s"receipt: $r")
    val m = SnapshotStore.manifest(spark, table,
      SnapshotStore.currentVersion(spark, table).get)
    assert(m.ndvFile.nonEmpty)
    val est = NdvStats.estimates(spark, m.ndvFile, SnapshotStore.dataFiles(spark, m))
    assert(est.contains("o_custkey"),
      "the refreshed sketches must cover the compacted files")
  }
}
