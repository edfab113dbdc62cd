package graft.tools

import graft.ops.BloomIndex
import graft.store.SnapshotStore

import org.apache.spark.sql.functions._

/** Scale probe for the round's two new read paths:
  *
  *  1. SCOPED-DV chains — a table that accumulated deletes AND appends
  *     (the streaming-ingest + GDPR-delete shape). Measures the head
  *     read of a commit → delete → append → delete → append chain vs a
  *     plain single-commit table of the same net rows: the scoped read
  *     splits into per-class anti joins, and the question is whether
  *     that costs more than the one-class legacy shape.
  *
  *  2. BLOOM file pruning — needle `=` lookups on a high-cardinality
  *     key the layout is NOT clustered by (min/max stats provably
  *     useless: every file spans the whole domain). Measures the same
  *     lookup with and without the manifest Bloom index, plus the
  *     files-read counts from the scan description.
  *
  * Usage: runMain graft.tools.DvBloomBench <sfDir> [files] [runs]
  */
object DvBloomBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(32)
    val runs = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local("graft-dvbloom")
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val orders = graft.sources.Tables.orders(spark, sfDir)

    // ---- 1. scoped-DV chain vs plain table --------------------------
    val chain = java.nio.file.Files.createTempDirectory("dvb-chain").toString + "/t"
    SnapshotStore.commit(orders.repartition(nFiles), chain)
    SnapshotStore.deleteCommit(spark, chain, Seq("o_orderkey"),
      pmod(col("o_orderkey"), lit(20)) === 1)                        // ~5%
    SnapshotStore.appendCommit(
      orders.filter(pmod(col("o_orderkey"), lit(40)) === 1).coalesce(2), chain)
    SnapshotStore.deleteCommit(spark, chain, Seq("o_orderkey"),
      pmod(col("o_orderkey"), lit(20)) === 3)                        // ~5% more
    SnapshotStore.appendCommit(
      orders.filter(pmod(col("o_orderkey"), lit(40)) === 3).coalesce(2), chain)

    val plain = java.nio.file.Files.createTempDirectory("dvb-plain").toString + "/t"
    SnapshotStore.commit(SnapshotStore.read(spark, chain), plain)

    def agg(t: String): Double = time {
      spark.read.format("graft-snapshot").option("path", t).load()
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)), sum(round(col("o_totalprice") * 100).cast("long")))
        .collect()
    }
    agg(chain); agg(plain) // warm
    val chainT = median((1 to runs).map(_ => agg(chain)))
    val plainT = median((1 to runs).map(_ => agg(plain)))
    val nChain = spark.read.format("graft-snapshot").option("path", chain).load().count()
    val nPlain = spark.read.format("graft-snapshot").option("path", plain).load().count()
    require(nChain == nPlain, s"chain/plain disagree: $nChain vs $nPlain")
    println(f"dv-chain: rows=$nChain%d files=$nFiles%d+4 chain=${chainT}%.3f s " +
      f"plain=${plainT}%.3f s overhead=${chainT / plainT}%.2fx")

    // ---- 2. bloom needle lookup ------------------------------------
    val bt = java.nio.file.Files.createTempDirectory("dvb-bloom").toString + "/t"
    // o_orderkey is range-clustered by generation; shuffle the layout so
    // min/max can't prune and only the bloom can
    SnapshotStore.commit(orders.repartition(nFiles, col("o_custkey")), bt)
    val needleRow = orders.select(max(col("o_orderkey"))).head()
    val needle = needleRow.getLong(0) / 2 + 1 // mid-domain, exists or near
    def look(t: String): Double = time {
      spark.read.format("graft-snapshot").option("path", t).load()
        .filter(col("o_orderkey") === needle).collect()
    }
    look(bt) // warm, pre-index
    val noIdx = median((1 to runs).map(_ => look(bt)))
    BloomIndex.bloomCommit(spark, bt, Seq("o_orderkey"),
      expectedItems = math.max(1L << 16, nPlain / nFiles * 2))
    look(bt) // warm, post-index
    val withIdx = median((1 to runs).map(_ => look(bt)))
    val desc = {
      val df = spark.read.format("graft-snapshot").option("path", bt).load()
        .filter(col("o_orderkey") === needle)
      df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }.getOrElse("?")
    }
    val files = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(desc)
      .map(m => s"${m.group(1)}/${m.group(2)}").getOrElse("?")
    println(f"bloom   : needle=$needle%d noIndex=${noIdx}%.3f s " +
      f"withIndex=${withIdx}%.3f s speedup=${noIdx / withIdx}%.2fx filesRead=$files")
    spark.stop()
  }
}
