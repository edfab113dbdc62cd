package graft.tools

import graft.Sessions
import graft.ops.NdvStats
import graft.store.{FileStats, SnapshotStore}

import org.apache.spark.sql.functions._

/** 10⁵-FILE METADATA LADDER (round 14): synthesizes a manifest + stats
  * sidecar + NDV sidecar at ~100 000 files — the 100 TB table shape —
  * WITHOUT writing 100 000 data files (planning never opens data
  * files; that independence is exactly what this measures), then
  * times the plan-time metadata paths and proves with counters that
  * the driver-materializing paths are bypassed above their byte caps.
  *
  * Measured:
  *  1. stats-sidecar parse wall at N entries (the O(files) component
  *     every planned scan pays once per table version),
  *  2. NDV estimates: DRIVER path (cap raised; collect+parse N×cols
  *     sketches) vs DISTRIBUTED path (cap default; hll_union_agg job,
  *     one row per column returns) — wall + entry/union counters,
  *  3. deletion vectors on a REAL table: broadcast (driver collect)
  *     vs task-side resolution around the 16 MB default cap.
  *
  * Usage: `SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.MetadataLadderBench [nFiles]"`
  * Prints one JSON line; paste the numbers into SCALE.md. */
object MetadataLadderBench {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = Sessions.local("graft-mdladder")
    val root = java.nio.file.Files.createTempDirectory("mdladder").toString
    val table = s"$root/t"

    // seed a real table (schema + real v0) — the synthetic manifest
    // publishes on top of it
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.01")
      .select("o_orderkey", "o_custkey")
    SnapshotStore.commit(orders.repartition(4), table)

    // ---- synthesize N per-file metadata entries ----------------------
    val fakeFiles: Seq[String] =
      (0 until n).map(i => f"$table/v=0__synth/part-$i%06d.parquet")
    // stats sidecar: one row group per file, disjoint o_orderkey ranges
    val (statsFile, tSynthStats) = time {
      val blocks = fakeFiles.zipWithIndex.map { case (f, i) =>
        val lo = i.toLong * 10000L
        s"f=$f\nc=o_orderkey,o_custkey\ng=4,1048576,10000\n" +
          s"s=o_orderkey,l,$lo,${lo + 9999L}\nn=o_orderkey\n" +
          s"s=o_custkey,l,0,99999\nn=o_custkey\n"
      }
      FileStats.write(spark, table, exact = true, blocks)
    }
    // NDV sidecar: a DISTINCT dense HLL (lgK=12, ~4 KB updatable) + a
    // KLL sketch per (file, column), built executor-side — distinct
    // bytes per row, or parquet dictionary-encodes 100k identical
    // sketches down to nothing and the ladder never crosses the cap
    val (ndvFile, tSynthNdv) = time {
      val out = s"$table/_ndv/n_synth"
      import spark.implicits._
      spark.createDataset(fakeFiles.map(SnapshotStore.relFileKey))
        .repartition(32)
        .mapPartitions { it =>
          it.map { f =>
            val seed = java.lang.Integer.toUnsignedLong(f.hashCode)
            val h = new org.apache.datasketches.hll.HllSketch(NdvStats.LgK)
            var i = 0L
            while (i < 2000L) { h.update(seed * 100000L + i); i += 1 }
            val k = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
            var j = 0
            while (j < 1000) { k.update((seed % 1000L + j).toDouble); j += 1 }
            (f, "o_custkey", h.toUpdatableByteArray, 0L, k.toByteArray)
          }
        }.toDF("file", "col", "sketch", "nulls", "kll")
        .write.mode("overwrite").parquet(out)
      out
    }
    val m0 = SnapshotStore.manifest(spark, table, 0L)
    require(SnapshotStore.tryPublishManifest(spark, table, 1L,
      m0.copy(files = fakeFiles, op = "synth", ts = 0L,
        statsFile = statsFile, ndvFile = ndvFile)))
    val m = SnapshotStore.manifest(spark, table, 1L)

    // ---- 1. sidecar parse wall ---------------------------------------
    val (sc, tStats) = time { FileStats.read(spark, m.statsFile) }
    require(sc.entries.size == n, s"sidecar entries ${sc.entries.size} != $n")

    // ---- 1b. schema resolution: manifest-pinned, zero footer reads ----
    // (the footer-union alternative is O(files) — unmeasurable here
    // because the synthetic files don't exist, which is the point: a
    // pinned table PLANS without them)
    val fr0 = graft.sources.SnapshotScanProbe.plannerFooterReads
    val (schema, tSchema) = time { graft.store.ColumnMapping.tableSchema(spark, m) }
    require(schema.fieldNames.sameElements(Array("o_orderkey", "o_custkey")),
      s"pinned schema resolved wrong: $schema")
    require(graft.sources.SnapshotScanProbe.plannerFooterReads == fr0,
      "pinned schema resolution must read zero footers")

    // ---- 2. NDV: driver vs distributed -------------------------------
    val ndvBytes = {
      val p = new org.apache.hadoop.fs.Path(ndvFile)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    }
    // force DRIVER path: raise the cap above the sidecar size
    spark.conf.set("spark.graft.ndv.driverBytesMax", (ndvBytes + 1).toString)
    val d0 = NdvStats.driverEntriesLoaded.get()
    val (estDriver, tNdvDriver) = time { NdvStats.estimates(spark, ndvFile, fakeFiles) }
    val driverEntries = NdvStats.driverEntriesLoaded.get() - d0
    // force DISTRIBUTED path: default 32 MB cap (the synth sidecar is
    // bigger) — but set explicitly so the ladder is self-describing
    spark.conf.set("spark.graft.ndv.driverBytesMax", (32L << 20).toString)
    val u0 = NdvStats.distributedUnions.get()
    val d1 = NdvStats.driverEntriesLoaded.get()
    val (estDist, tNdvDist) = time {
      // distinct file set → different cache key than any earlier call
      NdvStats.estimates(spark, ndvFile, fakeFiles.reverse)
    }
    val distUnions = NdvStats.distributedUnions.get() - u0
    val distDriverEntries = NdvStats.driverEntriesLoaded.get() - d1
    spark.conf.unset("spark.graft.ndv.driverBytesMax")
    require(estDriver == estDist,
      s"driver and distributed NDV paths must agree: $estDriver vs $estDist")
    require(ndvBytes > (32L << 20) || n < 20000,
      s"synth NDV sidecar (${ndvBytes}B) should exceed the default 32 MB cap at n=$n")
    require(distUnions >= 1 && distDriverEntries == 0L,
      "above the cap the driver must parse ZERO sketch entries")

    // ---- 3. DV: task-side vs broadcast, both paths forced by cap -----
    // (1.5M sorted-long keys delta-encode to well under the 16 MB
    // default, so each path is pinned explicitly and the actual DV
    // bytes are reported for the where-would-the-default-route story)
    val dvTable = s"$root/dv"
    SnapshotStore.commit(
      spark.range(0, 3000000).selectExpr("id", "id * 2 AS v").repartition(8), dvTable)
    SnapshotStore.deleteCommit(spark, dvTable, Seq("id"),
      pmod(col("id"), lit(2)) === 0L) // 1.5M deleted keys
    val dvBytes = {
      val mdv = SnapshotStore.manifest(spark, dvTable,
        SnapshotStore.currentVersion(spark, dvTable).get)
      val hc = spark.sparkContext.hadoopConfiguration
      mdv.deletes.map { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(hc).getContentSummary(p).getLength
      }.sum
    }
    def readDv() = spark.read.format("graft-snapshot").option("path", dvTable).load()
      .agg(count(lit(1)), sum("v")).collect()(0)
    val b0 = graft.sources.SnapshotScanProbe.dvTaskSideBuilds
    spark.conf.set("spark.graft.dv.driverBytesMax", "1") // force task-side
    val (rTask, tDvTask) = time { readDv() }
    val taskBuilds = graft.sources.SnapshotScanProbe.dvTaskSideBuilds - b0
    spark.conf.set("spark.graft.dv.driverBytesMax", (1L << 30).toString)
    val (rBcast, tDvBcast) = time { readDv() } // raised cap: broadcast
    spark.conf.unset("spark.graft.dv.driverBytesMax")
    require(rTask == rBcast, "DV paths must agree")
    require(taskBuilds >= 1, "cap=1 must route task-side")

    println(
      s"""{"metric":"metadata_ladder","n_files":$n,"synth_stats_sec":${f"$tSynthStats%.2f"},"synth_ndv_sec":${f"$tSynthNdv%.2f"},"ndv_sidecar_bytes":$ndvBytes,"stats_parse_sec":${f"$tStats%.2f"},"schema_resolution_sec":${f"$tSchema%.3f"},"ndv_driver_sec":${f"$tNdvDriver%.2f"},"ndv_driver_entries":$driverEntries,"ndv_distributed_sec":${f"$tNdvDist%.2f"},"ndv_distributed_unions":$distUnions,"ndv_distributed_driver_entries":$distDriverEntries,"dv_bytes":$dvBytes,"dv_taskside_sec":${f"$tDvTask%.2f"},"dv_taskside_builds":$taskBuilds,"dv_broadcast_sec":${f"$tDvBcast%.2f"}}""")
    spark.stop()
  }
}
