package graft.tools

import graft.Sessions
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off: isolate bloomSemiJoin cost vs the plain semi join on the
  * same replicated fixture. `runMain graft.tools.BloomProbe [sfDir] [factor]`. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 8
    val spark = Sessions.local("graft-bloom-probe")

    def replicate(df: DataFrame, idCols: Seq[String], shift: Long): DataFrame =
      (0 until factor).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * shift)))
      }.reduce(_ unionAll _)

    val lN = replicate(Tables.lineitem(spark, sfDir), Seq("l_orderkey"), 100000000L)
    val dim = lN.filter(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey").alias("r_orderkey")).distinct()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[bloomprobe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
    }

    time("dim_count")(dim.count())
    time("plain_semi")(lN.join(dim, lN("l_orderkey") === col("r_orderkey"), "left_semi").count())
    time("bloom_build") {
      val b = graft.ops.RuntimeFilter.buildBloom(dim, "r_orderkey",
        (1L << 16) * factor, (1L << 20) * factor)
      b.length.toLong
    }
    time("bloom_semi")(graft.ops.RuntimeFilter.bloomSemiJoin(
      lN, "l_orderkey", dim, "r_orderkey",
      expectedItems = (1L << 16) * factor, numBits = (1L << 20) * factor).count())
    spark.stop()
  }
}
// granular timing appended as a second main
object BloomProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 8
    val spark = Sessions.local("graft-bloom-probe2")
    def replicate(df: DataFrame, idCols: Seq[String], shift: Long): DataFrame =
      (0 until factor).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * shift)))
      }.reduce(_ unionAll _)
    val lN = replicate(Tables.lineitem(spark, sfDir), Seq("l_orderkey"), 100000000L)
    val dim = lN.filter(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey").alias("r_orderkey")).distinct()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[bp2] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
    }
    time("scan_only")(lN.count())
    val small = graft.ops.RuntimeFilter.buildBloom(dim, "r_orderkey", 1L << 16, 1L << 20)
    val big = graft.ops.RuntimeFilter.buildBloom(dim, "r_orderkey", (1L << 16) * factor, (1L << 20) * factor)
    println(s"[bp2] small=${small.length}B big=${big.length}B")
    time("probe_small")(lN.where(graft.ops.RuntimeFilter.mightContain(small, col("l_orderkey"))).count())
    time("probe_big")(lN.where(graft.ops.RuntimeFilter.mightContain(big, col("l_orderkey"))).count())
    time("probe_big2")(lN.where(graft.ops.RuntimeFilter.mightContain(big, col("l_orderkey"))).count())
    spark.stop()
  }
}
// cached-dim comparison
object BloomProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 8
    val spark = Sessions.local("graft-bloom-probe3")
    def replicate(df: DataFrame, idCols: Seq[String], shift: Long): DataFrame =
      (0 until factor).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * shift)))
      }.reduce(_ unionAll _)
    val lN = replicate(Tables.lineitem(spark, sfDir), Seq("l_orderkey"), 100000000L)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[bp3] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
    }
    val bdim = lN.filter(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey").alias("r_orderkey")).distinct().persist()
    time("dim_materialize")(bdim.count())
    time("plain_semi_cached")(lN.join(bdim, lN("l_orderkey") === col("r_orderkey"), "left_semi").count())
    time("bloom_semi_cached")(graft.ops.RuntimeFilter.bloomSemiJoin(
      lN, "l_orderkey", bdim, "r_orderkey",
      expectedItems = (1L << 16) * factor, numBits = (1L << 20) * factor).count())
    spark.stop()
  }
}
// step-by-step decomposition of the cached form
object BloomProbe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 8
    val spark = Sessions.local("graft-bloom-probe4")
    def replicate(df: DataFrame, idCols: Seq[String], shift: Long): DataFrame =
      (0 until factor).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * shift)))
      }.reduce(_ unionAll _)
    val lN = replicate(Tables.lineitem(spark, sfDir), Seq("l_orderkey"), 100000000L)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[bp4] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
    }
    val bdim = lN.filter(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey").alias("r_orderkey")).distinct().persist()
    time("dim_materialize")(bdim.count())
    var bloom: Array[Byte] = null
    time("build_from_cache") {
      bloom = graft.ops.RuntimeFilter.buildBloom(bdim, "r_orderkey",
        (1L << 16) * factor, (1L << 20) * factor); bloom.length.toLong
    }
    val pruned = lN.where(graft.ops.RuntimeFilter.mightContain(bloom, col("l_orderkey")))
    time("pruned_scan")(pruned.count())
    time("final_join")(pruned.join(bdim, pruned("l_orderkey") === col("r_orderkey"), "left_semi").count())
    spark.stop()
  }
}
// literal-size sensitivity of the final join
object BloomProbe5 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 8
    val spark = Sessions.local("graft-bloom-probe5")
    def replicate(df: DataFrame, idCols: Seq[String], shift: Long): DataFrame =
      (0 until factor).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * shift)))
      }.reduce(_ unionAll _)
    val lN = replicate(Tables.lineitem(spark, sfDir), Seq("l_orderkey"), 100000000L)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[bp5] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
    }
    val bdim = lN.filter(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey").alias("r_orderkey")).distinct().persist()
    bdim.count()
    for ((label, items, bits) <- Seq(
        ("small_128KB", 1L << 16, 1L << 20),
        ("big_1MB", (1L << 16) * factor, (1L << 20) * factor))) {
      val bloom = graft.ops.RuntimeFilter.buildBloom(bdim, "r_orderkey", items, bits)
      val pruned = lN.where(graft.ops.RuntimeFilter.mightContain(bloom, col("l_orderkey")))
      time(s"join_$label")(pruned.join(bdim, pruned("l_orderkey") === col("r_orderkey"), "left_semi").count())
      time(s"join2_$label")(pruned.join(bdim, pruned("l_orderkey") === col("r_orderkey"), "left_semi").count())
    }
    spark.stop()
  }
}
