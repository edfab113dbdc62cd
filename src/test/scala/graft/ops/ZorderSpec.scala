package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Z-order clustering + file-level min-max skipping. */
class ZorderSpec extends SparkSuite {

  import spark.implicits._

  test("zValue interleaves bits (Morton code) exactly") {
    // hand-computed morton codes for (x, y) at 4 bits:
    // z = x0 y0 x1 y1 ... with x at even positions (i=0), y odd (i=1)
    def morton(x: Int, y: Int, bits: Int): Long = {
      var z = 0L
      for (k <- 0 until bits) {
        z |= ((x >> k) & 1).toLong << (2 * k)
        z |= ((y >> k) & 1).toLong << (2 * k + 1)
      }
      z
    }
    val rows = Seq((0, 0), (1, 0), (0, 1), (1, 1), (5, 9), (15, 15), (7, 2))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Zorder.zValue(Seq(col("x"), col("y")), 4).alias("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) === morton(x, y, 4), s"($x,$y)")
    }
  }

  test("skippingScan returns exactly the full-scan filter result") {
    val dir = java.nio.file.Files.createTempDirectory("zspec").toString + "/t"
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x.toLong, y.toLong, x * 256L + y)))
      .toDF("x", "y", "payload")
    Zorder.writeZordered(grid, dir, Seq("x", "y"), bits = 8, numFiles = 16)
    Zorder.writeFileStats(spark, dir, Seq("x", "y"))
    val ranges = Map("x" -> (37L, 99L), "y" -> (140L, 201L))
    val got = Zorder.skippingScan(spark, dir, ranges)
      .select(col("payload")).collect().map(_.getLong(0)).toSet
    val expected = spark.read.parquet(dir)
      .filter(col("x").between(37, 99) && col("y").between(140, 201))
      .select(col("payload")).collect().map(_.getLong(0)).toSet
    assert(got === expected && got.nonEmpty)
  }

  test("z-order prunes files on BOTH dimensions; a linear sort prunes only its leading column") {
    val base = java.nio.file.Files.createTempDirectory("zprune").toString
    val zDir = s"$base/z"
    val linDir = s"$base/lin"
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    Zorder.writeZordered(grid, zDir, Seq("x", "y"), bits = 8, numFiles = 16)
    Zorder.writeFileStats(spark, zDir, Seq("x", "y"))
    // linear layout: range-partitioned + sorted by x alone
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(linDir)
    Zorder.writeFileStats(spark, linDir, Seq("x", "y"))

    // predicate on the SECOND dimension only: y < 32 (1/8 of the area)
    val yOnly = Map("y" -> (0L, 31L))
    val zFiles = Zorder.selectFiles(spark, zDir, yOnly).size
    val linFiles = Zorder.selectFiles(spark, linDir, yOnly).size
    val total = Zorder.totalFiles(spark, zDir)
    assert(total === 16)
    // morton: y<32 fixes y's top bits → 4 matching quadrant segments;
    // sampled range-partition boundaries can straddle a couple more
    // files but never approach the linear layout's full read
    assert(zFiles <= 6, s"z-order should prune the y-range to ≤6 of 16 files, read $zFiles")
    // linear-by-x layout: every file spans all y — nothing prunes
    assert(linFiles === 16, s"linear layout cannot prune on y, selected $linFiles")

    // and a 2-D box prunes harder still: one contiguous z-quadrant
    // (1/16 of the curve) plus sampled-boundary straddle
    val box = Map("x" -> (0L, 63L), "y" -> (0L, 63L))
    assert(Zorder.selectFiles(spark, zDir, box).size <= 4,
      "a 1/16-area box should live in ≤4 curve segments")
  }

  test("optimizeCommit re-clusters a snapshot table atomically; rows identical, skipping works") {
    val table = java.nio.file.Files.createTempDirectory("zopt").toString + "/t"
    val grid = (0 until 128).flatMap(x => (0 until 128).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    // v0: unclustered commit (row-linear layout)
    graft.store.SnapshotStore.commit(grid.repartition(8), table)
    val v = Zorder.optimizeCommit(spark, table, Seq("x", "y"), bits = 7, numFiles = 8)
    assert(v === 1L)
    // same rows, new layout
    val before = graft.store.SnapshotStore.readVersion(spark, table, 0L)
    val after = graft.store.SnapshotStore.readVersion(spark, table, 1L)
    assert(before.exceptAll(after).count() === 0 && after.exceptAll(before).count() === 0)
    // the optimized snapshot prunes on the second dimension
    val dir = graft.store.SnapshotStore.versionDir(table, 1L)
    val sel = Zorder.selectFiles(spark, dir, Map("y" -> (0L, 15L)))
    assert(sel.size < 8, s"optimized layout should prune y-range, selected ${sel.size}/8")
    val got = Zorder.skippingScan(spark, dir, Map("y" -> (0L, 15L))).count()
    assert(got === 128L * 16)
  }

  test("skippingScan on an empty-qualifying range returns no rows without error") {
    val dir = java.nio.file.Files.createTempDirectory("zempty").toString + "/t"
    val grid = (0 until 64).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    Zorder.writeZordered(grid, dir, Seq("x", "y"), bits = 6, numFiles = 4)
    Zorder.writeFileStats(spark, dir, Seq("x", "y"))
    assert(Zorder.skippingScan(spark, dir, Map("x" -> (1000L, 2000L))).count() === 0)
  }

  test("bloom index: point lookup opens ~1 file of many, result equals the plain filter") {
    val dir = java.nio.file.Files.createTempDirectory("bspec").toString + "/t"
    // hash-scattered high-cardinality keys: every file spans the whole
    // key range, so the min/max envelope CANNOT prune — the case the
    // bloom index exists for
    spark.range(0, 200000).toDF("k")
      .withColumn("payload", col("k") * 7)
      .repartition(16, col("k") % 997) // scatter uncorrelated with k
      .write.parquet(dir)
    BloomIndex.writeFileBloomIndex(spark, dir, "k",
      expectedItems = 1L << 15, numBits = 1L << 19)
    assert(BloomIndex.totalFiles(spark, dir) === 16L)

    // envelope pruning is indeed useless on this layout
    Zorder.writeFileStats(spark, dir, Seq("k"))
    assert(Zorder.selectFiles(spark, dir, Map("k" -> (123456L, 123456L))).size === 16)

    // bloom pruning opens the one true file (+ rare false positives)
    val files = BloomIndex.selectFiles(spark, dir, 123456L)
    assert(files.nonEmpty && files.size <= 3, s"expected ~1 file, got ${files.size}")
    val got = BloomIndex.pointLookup(spark, dir, "k", 123456L)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("payload"))).toSeq
    assert(got === Seq((123456L, 864192L)))

    // no false negatives across many probes; misses return empty
    (0 until 50).foreach { i =>
      val k = i * 3989L % 200000
      assert(BloomIndex.pointLookup(spark, dir, "k", k).count() === 1L, s"k=$k")
    }
    assert(BloomIndex.pointLookup(spark, dir, "k", 999999999L).count() === 0L)

    // multiLookup: union of per-key file sets, exact IN re-applied
    val multi = BloomIndex.multiLookup(spark, dir, "k", Seq(5L, 99999L, 555555555L))
      .collect().map(_.getAs[Long]("k")).toSet
    assert(multi === Set(5L, 99999L))
  }

  test("optimizePartitionCommit: one partition rewrites, a fully-covered DV clears") {
    import graft.store.{PartitionSpec, SnapshotStore}
    val t = java.nio.file.Files.createTempDirectory("zpopt").toString + "/t"
    // ONE partition value only: the delete's DV scope covers exactly the
    // files the optimize rewrites, so the commit must CLEAR the DV
    val rows = spark.range(0, 10000)
      .selectExpr("id AS k", "CAST(id % 97 AS LONG) AS x", "CAST(id % 89 AS LONG) AS y",
        "timestamp'2024-03-05 00:00:00' AS ts")
      .repartition(4)
    SnapshotStore.partitionedCommit(rows, t, Seq(PartitionSpec.PartField("months", "ts")))
    SnapshotStore.deleteCommit(spark, t, Seq("k"), col("k") % 100 === 7)
    assert(SnapshotStore.manifest(spark, t, 1L).deletes.nonEmpty)
    val v = Zorder.optimizePartitionCommit(spark, t, Seq("x", "y"),
      bits = 8, numFiles = 2, value = "2024-03")
    val m = SnapshotStore.manifest(spark, t, v)
    assert(m.op === "zorder-partition")
    assert(m.deletes.isEmpty && m.keyCols.isEmpty,
      "a DV whose scope has no kept file left must clear from the manifest")
    val got = SnapshotStore.read(spark, t)
    assert(got.count() === 10000 - 100)
    assert(got.filter(col("k") % 100 === 7).count() === 0L,
      "the rewritten files must be DV-materialized")
    // the z-ordered partition clusters: each fresh file's x-range is a
    // fraction of the domain (the point of the rewrite)
    assert(m.files.forall(_.contains("/__gp0=2024-03/")),
      "rewritten files stay routed under the same partition directory")
  }

  test("bloom index over the driver byte cap probes in executors, same answer") {
    val dir = java.nio.file.Files.createTempDirectory("bcap").toString + "/t"
    spark.range(0, 50000).toDF("k")
      .withColumn("payload", col("k") + 1)
      .repartition(8, col("k") % 499)
      .write.parquet(dir)
    BloomIndex.writeFileBloomIndex(spark, dir, "k",
      expectedItems = 1L << 14, numBits = 1L << 18)
    val onDriver = BloomIndex.selectFiles(spark, dir, 4242L).toSet
    val before = BloomIndex.distributedProbes.get()
    spark.conf.set("spark.graft.bloom.driverBytesMax", "1") // force executor path
    try {
      val distributed = BloomIndex.selectFiles(spark, dir, 4242L).toSet
      assert(BloomIndex.distributedProbes.get() > before,
        "the tiny cap must route the probe through the executor path")
      assert(distributed === onDriver,
        "capped and driver probes must select the same files")
      assert(BloomIndex.pointLookup(spark, dir, "k", 4242L)
        .collect().map(_.getAs[Long]("payload")).toSeq === Seq(4243L))
    } finally spark.conf.unset("spark.graft.bloom.driverBytesMax")
  }
}
