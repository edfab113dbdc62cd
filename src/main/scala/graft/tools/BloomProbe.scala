package graft.tools

import graft.Sessions
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-runtime-filter forensics: the measurements behind the three
  * boundary conditions documented in `ops/RuntimeFilter` + SCALE.md —
  * (1) plain semi baseline, (2) literal-vs-broadcast probe shipping
  * (the 1 MB plan-literal task-serialization tax), (3) cached-vs-
  * uncached dim (the op evaluates dim twice). One shared fixture; run
  * with `runMain graft.tools.BloomProbe [sfDir] [factor]`.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 8
    val spark = Sessions.local("graft-bloom-probe")

    def replicate(df: DataFrame, idCols: Seq[String], shift: Long): DataFrame =
      (0 until factor).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * shift)))
      }.reduce(_ unionAll _)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[bloomprobe] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
    }

    val lN = replicate(Tables.lineitem(spark, sfDir), Seq("l_orderkey"), 100000000L)
    val dim = lN.filter(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey").alias("r_orderkey")).distinct()
    val items = (1L << 16) * factor
    val bits = (1L << 20) * factor

    time("scan_only")(lN.count())
    time("plain_semi_uncached")(
      lN.join(dim, lN("l_orderkey") === dim("r_orderkey"), "left_semi").count())
    time("bloom_semi_uncached")(graft.ops.RuntimeFilter.bloomSemiJoin(
      lN, "l_orderkey", dim, "r_orderkey", items, bits).count())

    val bdim = dim.persist()
    time("dim_materialize")(bdim.count())
    time("plain_semi_cached")(
      lN.join(bdim, lN("l_orderkey") === bdim("r_orderkey"), "left_semi").count())
    time("bloom_semi_cached")(graft.ops.RuntimeFilter.bloomSemiJoin(
      lN, "l_orderkey", bdim, "r_orderkey", items, bits).count())

    val bloom = graft.ops.RuntimeFilter.buildBloom(bdim, "r_orderkey", items, bits)
    println(s"[bloomprobe] filter_bytes=${bloom.length}")
    time("probe_literal")(
      lN.where(graft.ops.RuntimeFilter.mightContain(bloom, col("l_orderkey"))).count())
    time("probe_broadcast")(
      lN.where(graft.ops.RuntimeFilter.mightContainBroadcast(spark, bloom, col("l_orderkey"))).count())
    bdim.unpersist(blocking = false)
    spark.stop()
  }
}
