package graft.tools

import graft.sources.Tables
import graft.store.SnapshotStore

import org.apache.spark.sql.functions._

/** Measures the deletion-vector probe tax: single-key vs composite-key
  * DV scans through the DSv2 connector at a given scale dir — the r10
  * verdict asked for the composite path within ~1.5× of single-key
  * after the UnsafeRow byte-image probe replaced boxed tuple hashing.
  *
  * Usage: runMain graft.tools.DvProbeBench <sfDir> [runs]
  * Prints one line per mode: median scan seconds over `runs` warm runs.
  */
object DvProbeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.local("graft-dvbench")
    val orders = Tables.orders(spark, sfDir)
    val n = orders.count()

    def scanSec(table: String): Seq[Double] =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        spark.read.format("graft-snapshot").option("path", table).load()
          .agg(count(lit(1)), sum(col("o_totalprice"))).collect()
        (System.nanoTime() - t0) / 1e9
      }

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val files = spark.sparkContext.defaultParallelism.max(4)

    // single-key DV (~2% deleted)
    val t1 = java.nio.file.Files.createTempDirectory("dvb-single").toString + "/t"
    SnapshotStore.commit(orders.repartition(files), t1)
    SnapshotStore.deleteCommit(spark, t1, Seq("o_orderkey"),
      pmod(col("o_orderkey"), lit(50)) === 1)
    val single = scanSec(t1)

    // composite-key DV, same ~2% volume (custkey mod plus status narrows it)
    val t2 = java.nio.file.Files.createTempDirectory("dvb-multi").toString + "/t"
    SnapshotStore.commit(orders.repartition(files), t2)
    SnapshotStore.deleteCommit(spark, t2, Seq("o_custkey", "o_orderstatus"),
      pmod(col("o_custkey"), lit(20)) === 1 && col("o_orderstatus") === "O")
    val multi = scanSec(t2)

    println(f"rows=$n single_median=${median(single)}%.3f s (runs=${single.map(x => f"$x%.3f").mkString(",")})")
    println(f"rows=$n multi_median=${median(multi)}%.3f s (runs=${multi.map(x => f"$x%.3f").mkString(",")})")
    println(f"composite_over_single=${median(multi) / median(single)}%.2f x")
    spark.stop()
  }
}
