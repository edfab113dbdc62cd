package graft.tools

import graft.store.SnapshotStore

import org.apache.spark.sql.functions._

/** Scale probe for JOIN-DRIVEN DYNAMIC FILE PRUNING (the DSv2 runtime
  * filter) and scan-reported statistics:
  *
  *  1. A star join whose dim filter is on a NON-key column, so the
  *     surviving join keys exist only at runtime — the exact shape
  *     static pushdown cannot prune. Measures the fact-side scan with
  *     dynamic pruning ON vs OFF on a fact range-clustered by the join
  *     key, plus the runtime-pruned group count.
  *
  *  2. The same join WITHOUT a broadcast hint: scan-reported statistics
  *     must auto-broadcast the small dim (before this, DSv2 relations
  *     defaulted to Long.MaxValue size and always shuffled).
  *
  * Usage: runMain graft.tools.DppBench <sfDir> [files] [runs]
  */
object DppBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(32)
    val runs = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local("graft-dpp")
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // fact: orders range-clustered by custkey; dim: customers filtered
    // on name (non-key), ~0.1% of keys survive
    val fact = java.nio.file.Files.createTempDirectory("dpp-fact").toString + "/t"
    SnapshotStore.commit(
      graft.sources.Tables.orders(spark, sfDir)
        // synthesize the fact's FAT payload column (the testdata orders
        // carry no o_comment): wide rows are where avoided IO actually
        // shows up — thin two-column projections are planner-bound
        .withColumn("o_payload",
          concat_ws("|", (0 until 16).map(_ => col("o_orderpriority")): _*))
        .repartitionByRange(nFiles, col("o_custkey")), fact)
    val custs = graft.sources.Tables.customer(spark, sfDir)
    // c_name is ~100x-duplicated in the generated data, so each picked
    // name stands for ~100 surviving custkeys; a handful of names is
    // the realistic "dim attribute = X" selectivity (~0.02% of keys)
    val nDim = args.lift(3).map(_.toInt).getOrElse(3)
    val names = custs.select(col("c_name")).orderBy(col("c_custkey"))
      .limit(5000).collect().map(_.getString(0))
    val wanted = (0 until nDim).map(i => names(i * names.length / nDim)).distinct

    def star(): org.apache.spark.sql.DataFrame =
      spark.read.format("graft-snapshot").option("path", fact).load()
        .join(broadcast(custs.filter(col("c_name").isin(wanted: _*))
          .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
          sum(length(col("o_payload")).cast("long")).as("payload_chars"))

    def run(dpp: Boolean): Double = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", dpp.toString)
      try time(star().collect()) finally
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    }
    run(dpp = true); run(dpp = false) // warm
    graft.sources.SnapshotScanProbe.resetRuntimePrunedGroups()
    val onT = median((1 to runs).map(_ => run(dpp = true)))
    val pruned = graft.sources.SnapshotScanProbe.lastRuntimePrunedGroups
    val offT = median((1 to runs).map(_ => run(dpp = false)))
    println(f"[dpp] files=$nFiles dims=$nDim on=$onT%.3f s off=$offT%.3f s " +
      f"speedup=${offT / onT}%.2fx runtimePrunedGroups=$pruned")

    // ---- auto-broadcast from reported statistics --------------------
    val dim = java.nio.file.Files.createTempDirectory("dpp-dim").toString + "/t"
    SnapshotStore.commit(custs.select(col("c_custkey"), col("c_mktsegment")).coalesce(2), dim)
    val joined = graft.sources.Tables.orders(spark, sfDir)
      .join(spark.read.format("graft-snapshot").option("path", dim).load(),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    val bhj = joined.queryExecution.sparkPlan.collectFirst {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.isDefined
    val autoT = median((1 to runs).map(_ => time(joined.collect())))
    println(f"[stats] snapshot dim auto-broadcast=$bhj joinTime=$autoT%.3f s")
    spark.stop()
  }
}
