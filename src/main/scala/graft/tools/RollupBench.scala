package graft.tools

import org.apache.spark.sql.functions._

/** Scale ladder for the round-14 metadata-answer surfaces
  * (`runMain graft.tools.RollupBench <sfDir>`):
  *
  *  - GROUP BY rollup over an identity-partitioned table — the
  *    partition-directory + stats-sidecar fold vs the same aggregation
  *    forced through the distributed plan (a residual filter declines
  *    the pushdown);
  *  - CHECK-constraint contradiction — a filter provably disjoint from
  *    a constraint vs the same filter scanned for real.
  *
  * The point at 100 TB: both metadata paths are O(files) driver
  * arithmetic / O(1) proofs, so their wall time is FLAT across scale
  * factors while the distributed plans grow with the data. */
object RollupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.Sessions.local("graft-rollup-bench")
    val t = java.nio.file.Files.createTempDirectory("rollupbench").toString + "/orders"
    val orders = graft.sources.Tables.orders(spark, sfDir)
    graft.store.SnapshotStore.partitionedCommit(orders, t,
      Seq(graft.store.PartitionSpec.PartField("identity", "o_orderpriority")))
    graft.store.TableChecks.add(spark, t,
      graft.store.TableChecks.Check("price_pos", "o_totalprice >= 0",
        enforced = false, rely = true))

    def time(label: String)(f: => Long): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; val sec = (System.nanoTime() - t0) / 1e9
        (sec, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"ROLLUP $label%-28s $med%8.3f s  (rows=${runs.head._2})")
      med
    }

    val read = spark.read.format("graft-snapshot").option("path", t).load()
    // (a) metadata rollup: directory names + one sidecar read
    time("rollup_metadata") {
      read.groupBy("o_orderpriority")
        .agg(count(lit(1)), min("o_totalprice"), max("o_totalprice")).collect().length.toLong
    }
    // (b) the same rollup through the distributed plan (filter declines)
    time("rollup_distributed") {
      read.filter(col("o_orderkey") >= 0L).groupBy("o_orderpriority")
        .agg(count(lit(1)), min("o_totalprice"), max("o_totalprice")).collect().length.toLong
    }
    // (c) constraint contradiction: zero files planned
    time("check_contradiction") {
      read.filter(col("o_totalprice") < 0).count()
    }
    // (d) the same predicate scanned for real (no constraint to prove it)
    val t2 = t + "_nocheck"
    graft.store.SnapshotStore.commit(orders, t2)
    val read2 = spark.read.format("graft-snapshot").option("path", t2).load()
    time("negative_scan_real") {
      read2.filter(col("o_totalprice") < 0).count()
    }
    spark.stop()
  }
}
