package graft.tools

import graft.store.{PartitionSpec, SnapshotStore}
import graft.ops.{BloomIndex, NdvStats}

import org.apache.spark.sql.functions._

/** Round-12 scale ladders (run at sf1 / sf10, results in SCALE.md):
  *
  *  1. PARTITION PRUNING — month-partitioned orders: one-month
  *     aggregate vs the full-table aggregate; files pruned from paths.
  *  2. TASK-SIDE DVs — a 10%-of-table deletion vector: read wall with
  *     the driver broadcast path vs the forced task-side path (driver
  *     materializes zero keys), value parity asserted.
  *  3. BLOOM SHARDS — a 256-file two-column index: single-column probe
  *     deserializes one column's shard only; the forced distributed
  *     probe prunes identically with zero driver deserialization.
  *
  * Usage: runMain graft.tools.R12ScaleBench <sfDir> [workDir]
  */
object R12ScaleBench {
  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val work = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("r12scale").toString)
    val spark = graft.Sessions.local("r12-scale")
    val orders = graft.sources.Tables.orders(spark, sfDir)
    println(s"[r12] sf=$sfDir rows=${orders.count()}")

    // ---- 1. partition pruning ------------------------------------
    val pt = s"$work/part_orders"
    val (_, tCommit) = time {
      SnapshotStore.partitionedCommit(orders, pt,
        Seq(PartitionSpec.PartField("months", "o_orderdate")))
    }
    def readPt = spark.read.format("graft-snapshot").option("path", pt).load()
    val (full, tFull) = time {
      readPt.agg(count(lit(1)), sum("o_totalprice")).collect()(0) }
    graft.sources.SnapshotScanProbe.resetPartitionPrunedFiles()
    val (one, tMonth) = time {
      readPt.filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-03-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00")))
        .agg(count(lit(1)), sum("o_totalprice")).collect()(0) }
    val prunedFiles = graft.sources.SnapshotScanProbe.lastPartitionPrunedFiles
    val nFiles = SnapshotStore.dataFiles(spark,
      SnapshotStore.manifest(spark, pt, 0L)).size
    println(f"[r12] partition: commit=$tCommit%.2fs files=$nFiles full=$tFull%.2fs " +
      f"(rows=${full.getLong(0)}) oneMonth=$tMonth%.2fs (rows=${one.getLong(0)}, " +
      f"pruned $prunedFiles/$nFiles files from paths)")

    // ---- 2. task-side DVs (10% of the table) ----------------------
    val dt = s"$work/dv_orders"
    SnapshotStore.commit(orders.repartition(32), dt)
    SnapshotStore.deleteCommit(spark, dt, Seq("o_orderkey"),
      pmod(col("o_orderkey"), lit(10)) === 3) // 10% of keys
    def readDv = spark.read.format("graft-snapshot").option("path", dt).load()
    val (a, tBroadcast) = time {
      readDv.agg(count(lit(1)), sum("o_orderkey")).collect()(0) }
    val (a2, tBroadcastWarm) = time {
      readDv.agg(count(lit(1)), sum("o_orderkey")).collect()(0) }
    spark.conf.set("spark.graft.dv.driverBytesMax", "1")
    val (b, tTask) = time {
      readDv.agg(count(lit(1)), sum("o_orderkey")).collect()(0) }
    val (b2, tTaskWarm) = time {
      readDv.agg(count(lit(1)), sum("o_orderkey")).collect()(0) }
    spark.conf.unset("spark.graft.dv.driverBytesMax")
    require(a == b && a == a2 && b == b2, s"task-side DV parity broken: $a vs $b")
    println(f"[r12] dv10pct: broadcast=$tBroadcast%.2fs warm=$tBroadcastWarm%.2fs " +
      f"taskSide=$tTask%.2fs warm=$tTaskWarm%.2fs (rows=${a.getLong(0)})")

    // ---- 3. bloom shards on a 256-file table ----------------------
    val bt = s"$work/bloom_orders"
    SnapshotStore.commit(orders
      .select((col("o_orderkey") * 2654435761L % 1000000007L).alias("k"),
        concat(lit("c"), pmod(col("o_custkey"), lit(1000)).cast("string")).alias("tag"))
      .repartition(256), bt)
    val (_, tBloomBuild) = time { BloomIndex.bloomCommit(spark, bt, Seq("k", "tag")) }
    def lookup(k: Long) = spark.read.format("graft-snapshot").option("path", bt).load()
      .filter(col("k") === k)
    val d0 = graft.sources.SnapshotScanProbe.bloomEntriesDeserialized
    val (n1, tProbeCold) = time { lookup(12345L).count() }
    val shardReads = graft.sources.SnapshotScanProbe.bloomEntriesDeserialized - d0
    val (_, tProbeWarm) = time { lookup(54321L).count() }
    spark.conf.set("spark.graft.bloom.driverBytesMax", "1")
    val d1 = graft.sources.SnapshotScanProbe.bloomEntriesDeserialized
    val (n2, tProbeDist) = time { lookup(12345L).count() }
    spark.conf.unset("spark.graft.bloom.driverBytesMax")
    require(graft.sources.SnapshotScanProbe.bloomEntriesDeserialized == d1,
      "distributed probe must not deserialize on the driver")
    require(n1 == n2, s"bloom probe parity broken: $n1 vs $n2")
    println(f"[r12] bloom256: build=$tBloomBuild%.2fs probeCold=$tProbeCold%.2fs " +
      f"(driver deserialized $shardReads of 512 entries) probeWarm=$tProbeWarm%.2fs " +
      f"probeDistributed=$tProbeDist%.2fs")

    // ---- 4. NDV analyze cost + accuracy ---------------------------
    val nt = s"$work/ndv_orders"
    SnapshotStore.commit(orders.repartition(32), nt)
    val (_, tAnalyze) = time { NdvStats.analyzeCommit(spark, nt, Seq("o_custkey")) }
    val m = SnapshotStore.manifest(spark, nt,
      SnapshotStore.currentVersion(spark, nt).get)
    val est = NdvStats.estimates(spark, m.ndvFile,
      SnapshotStore.dataFiles(spark, m))("o_custkey")._1
    val (exact, tExact) = time { orders.select("o_custkey").distinct().count() }
    println(f"[r12] ndv: analyze=$tAnalyze%.2fs est=$est exact=$exact " +
      f"err=${math.abs(est - exact).toDouble / exact}%.4f (exact-pass cost $tExact%.2fs)")

    spark.stop()
  }
}
