package graft.tools

import graft.Sessions
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scaling probe: run the shuffle-heavy operator families at 1× and N×
  * the sf input (union-replicated with shifted keys so cardinalities —
  * not just row counts — scale) and print seconds per scale. A
  * super-linear jump flags an operator whose cost is NOT bounded by its
  * shuffle key (the 100 TB failure mode the plan tests can't see).
  *
  * Usage: `runMain graft.tools.ScaleProbe [sfDir] [factor]`.
  */
object ScaleProbe {
  private def time(label: String, f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 8
    val spark = Sessions.local("graft-scale-probe")

    def replicate(df: DataFrame, idCols: Seq[String], shift: Long): DataFrame =
      (0 until factor).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * shift)))
      }.reduce(_ unionAll _)

    val e1 = Tables.events(spark, sfDir)
    val eN = replicate(e1, Seq("user_id", "event_id"), 10000000L)
    val d1 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val dN = replicate(d1, Seq("doc_id"), 10000000L)
    val l1 = Tables.lineitem(spark, sfDir)
    val lN = replicate(l1, Seq("l_orderkey"), 100000000L)

    for ((tag, ev, doc, li) <- Seq(("1x", e1, d1, l1), (s"${factor}x", eN, dN, lN))) {
      time(s"$tag band_join", graft.ops.BandJoin.bucketed(
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").alias("vid"), col("ts_us").alias("a_us")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").alias("pid"), col("ts_us").alias("b_us")),
        Seq("user_id"), "a_us", "b_us", 3600L * 1000000L).count())
      time(s"$tag asof_native", graft.ops.AsOfNative.join(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").alias("pid"), col("ts_us").alias("pt")),
        ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts_us").alias("vt"))
          .agg(max(col("event_id")).alias("vid")),
        Seq("user_id"), "pt", "vt", 3600L * 1000000L).count())
      time(s"$tag minhash_pairs", graft.ops.Dedup.lshCandidatePairs(
        doc, "doc_id", "text").count())
      time(s"$tag groupby_agg", li
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1)))
        .count())
      time(s"$tag window_topn", {
        import org.apache.spark.sql.expressions.Window
        li.withColumn("rk", row_number().over(
          Window.partitionBy(col("l_suppkey")).orderBy(col("l_extendedprice").desc, col("l_orderkey"))))
          .filter(col("rk") <= 3).count()
      })
      time(s"$tag cdc_apply", graft.ops.ChangeData.applyChangelog(
        ev.select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"), col("value")),
        Seq("user_id"), "ts_us", "event_type", deleteOp = "error").count())
      time(s"$tag pack_greedy", graft.ops.Packing.packGreedy(
        doc.select((col("doc_id") % 97).cast("string").alias("src"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").alias("n_tokens")),
        "src", "doc_id", "n_tokens", 128L).count())
      time(s"$tag bm25", graft.ops.TextAnalysis.bm25(doc, "doc_id", "text").count())
      time(s"$tag funnel", {
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts_us")).alias("v_us"))
        val c = ev.filter(col("event_type") === "click").join(v, Seq("user_id"))
          .filter(col("ts_us") > col("v_us"))
          .groupBy(col("user_id")).agg(min(col("ts_us")).alias("c_us"))
        ev.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
          .filter(col("ts_us") > col("c_us"))
          .groupBy(col("user_id")).agg(min(col("ts_us")).alias("p_us")).count()
      })
      // Bloom pruning's contract (learned by measurement, see the op's
      // Scaladoc): a SELECTIVE dim, a filter sized to the key count
      // (an overloaded bloom → FPP ≈ 1 → pure overhead; now guarded in
      // the op), and a CACHED dim when it derives from an expensive
      // subtree (the op evaluates dim twice — build + join side).
      time(s"$tag bloom_semi", {
        val bdim = li.filter(col("l_orderkey") % 97 === 0)
          .select(col("l_orderkey").alias("r_orderkey")).distinct().persist()
        try graft.ops.RuntimeFilter.bloomSemiJoin(
          li, "l_orderkey", bdim, "r_orderkey",
          expectedItems = (1L << 16) * factor, numBits = (1L << 20) * factor).count()
        finally bdim.unpersist(blocking = false)
      })
      time(s"$tag divergence", graft.ops.TextAnalysis.sourceDivergence(
        doc.withColumn("source", (col("doc_id") % 20).cast("string")),
        "source", "text").count())
      time(s"$tag shard_shuffle", graft.ops.Sampling.shuffleShards(
        doc.select(col("doc_id")), col("doc_id"), 64).count())
    }
    spark.stop()
  }
}
