package graft.tools

import graft.Sessions
import graft.sql.MaterializedAgg
import org.apache.spark.sql.functions._

/** Measure the materialized-view rewrite payoff: the same aggregate
  * over the fact table, timed with the registry empty (scans the fact)
  * and with the MV registered (scans the summary). Usage:
  * `runMain graft.tools.MvProbe [sfDir]`. */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicate = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = Sessions.local("graft-mvprobe")
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("mvprobe").toString
    val base = s"$root/fact"
    val mv = s"$root/mv"
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .crossJoin(spark.range(replicate).toDF("__r"))
      .select(col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).alias("yr"),
        round(col("l_extendedprice") * 100).cast("long").alias("cents"),
        col("l_quantity"))
      .write.parquet(base)
    println(s"[mvprobe] fact rows: ${spark.read.parquet(base).count()}")

    def q = spark.read.parquet(base)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).alias("n"), sum(col("cents")).alias("sum_cents"),
        avg(col("l_quantity")).alias("avg_qty"))

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[mvprobe] $label%-28s $s%7.3f s"); s
    }

    q.count() // warm the reader
    MaterializedAgg.clear()
    val cold = (1 to 3).map(i => time(s"fact-scan run $i")(q.collect())).min
    val t0 = System.nanoTime()
    MaterializedAgg.create(spark, base, mv,
      Seq("l_returnflag", "l_linestatus", "yr"), Seq("cents", "l_quantity"))
    println(f"[mvprobe] mv build                     ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    val hot = (1 to 3).map(i => time(s"mv-rewrite run $i")(q.collect())).min
    println(f"[mvprobe] speedup ${cold / hot}%.1fx (fact ${cold}%.3f s -> mv ${hot}%.3f s)")
    spark.stop()
  }
}
