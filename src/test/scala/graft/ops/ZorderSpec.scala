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
    // morton: y<32 fixes y's top bits → only files in matching quadrants
    assert(zFiles <= 4, s"z-order should prune the y-range to ≤4 of 16 files, read $zFiles")
    // linear-by-x layout: every file spans all y — nothing prunes
    assert(linFiles === 16, s"linear layout cannot prune on y, selected $linFiles")

    // and a 2-D box prunes harder still
    val box = Map("x" -> (0L, 63L), "y" -> (0L, 63L))
    // the box is one z-quadrant (1/16 of the curve); sampled range
    // boundaries can split it across an extra file, never spread it wide
    assert(Zorder.selectFiles(spark, zDir, box).size <= 3,
      "a 1/16-area box should live in ≤3 curve segments")
  }

  test("skippingScan on an empty-qualifying range returns no rows without error") {
    val dir = java.nio.file.Files.createTempDirectory("zempty").toString + "/t"
    val grid = (0 until 64).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    Zorder.writeZordered(grid, dir, Seq("x", "y"), bits = 6, numFiles = 4)
    Zorder.writeFileStats(spark, dir, Seq("x", "y"))
    assert(Zorder.skippingScan(spark, dir, Map("x" -> (1000L, 2000L))).count() === 0)
  }
}
