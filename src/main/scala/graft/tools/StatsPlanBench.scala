package graft.tools

import graft.sources.Tables
import graft.store.SnapshotStore

import org.apache.spark.sql.functions._

/** Measures what the manifest stats sidecar buys at PLANNING time: a
  * snapshot table with many part files is planned (a) from its sidecar
  * — one small-file read, zero data-file footer opens — and (b) with
  * the `statsfile=` marker line stripped, i.e. the legacy path that
  * opens every file's footer serially on the driver. Reports wall
  * seconds for a filtered count plus the exact footer-open counts.
  * Local disk understates the win (a local footer open is ~0.2 ms; an
  * object-store one is a full round-trip), so the footer-open COUNT is
  * the scale-honest number: it is the per-query driver round-trip
  * budget at 100 TB file counts.
  *
  * Usage: runMain graft.tools.StatsPlanBench <sfDir> [files] [runs]
  */
object StatsPlanBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(200)
    val runs = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local("graft-statsplan")

    val t = java.nio.file.Files.createTempDirectory("spb").toString + "/t"
    SnapshotStore.commit(Tables.orders(spark, sfDir).repartition(nFiles), t)

    def plannedCount(): (Double, Long) = {
      val opens0 = footerOpens()
      val t0 = System.nanoTime()
      val n = spark.read.format("graft-snapshot").option("path", t).load()
        .filter(col("o_totalprice") > 500000.0)
        .count()
      require(n >= 0)
      ((System.nanoTime() - t0) / 1e9, footerOpens() - opens0)
    }
    def footerOpens(): Long =
      graft.sources.SnapshotScanProbe.plannerFooterReads

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // warm page cache + codegen once
    plannedCount()
    val withSidecar = (1 to runs).map(_ => plannedCount())
    println(f"sidecar : files=$nFiles%d median=${median(withSidecar.map(_._1))}%.3f s " +
      f"footerOpensPerQuery=${withSidecar.map(_._2).max}%d")

    // strip the statsfile line → legacy footer planning
    val marker = new org.apache.hadoop.fs.Path(s"$t/_commits/0")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(marker)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val out = fs.create(marker, true)
    try out.write(text.linesIterator.filterNot(_.startsWith("statsfile="))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()

    plannedCount()
    val noSidecar = (1 to runs).map(_ => plannedCount())
    println(f"footers : files=$nFiles%d median=${median(noSidecar.map(_._1))}%.3f s " +
      f"footerOpensPerQuery=${noSidecar.map(_._2).max}%d")
    spark.stop()
  }
}
