package graft.tools

import graft.sources.Tables
import graft.store.SnapshotStore

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures what storage-partitioned joins buy: orders ⨝ lineitem on
  * the order key over (a) co-bucketed snapshot tables (scans report
  * KeyGroupedPartitioning; zero exchanges) vs (b) plain snapshot
  * tables (both sides shuffle). Reports median wall seconds and the
  * exchange count actually planned. The structural claim at 100 TB is
  * the exchange count: a shuffle moves BOTH fact tables across the
  * cluster every query; the bucketed layout moved each once, at write.
  *
  * Usage: runMain graft.tools.SpjBench <sfDir> [buckets] [runs]
  */
object SpjBench {

  /** AQE-aware exchange count of an EXECUTED plan — runs the frame
    * first so adaptive stages are final. ONE home for the walker (the
    * plan-shape spec uses it too). */
  def countExchanges(df: DataFrame): Int = {
    df.collect()
    var n = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => n += 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case _ => ()
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.local("graft-spjbench")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val wh = java.nio.file.Files.createTempDirectory("spjbench").toString
    spark.conf.set("spark.sql.catalog.spjb", classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjb.warehouse", wh)

    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val line = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    SnapshotStore.bucketedCommit(orders, s"$wh/f/orders_b", Seq("o_orderkey"), buckets)
    SnapshotStore.bucketedCommit(line, s"$wh/f/line_b", Seq("o_orderkey"), buckets)
    SnapshotStore.commit(orders.repartition(buckets), s"$wh/f/orders_p")
    SnapshotStore.commit(line.repartition(buckets), s"$wh/f/line_p")

    def q(suffix: String): DataFrame = spark.sql(
      s"""SELECT count(*) AS n, sum(l.l_quantity * o.o_totalprice) AS v
          FROM spjb.f.orders_$suffix o JOIN spjb.f.line_$suffix l USING (o_orderkey)""")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    q("b").collect(); q("p").collect() // warm
    val exB = countExchanges(q("b"))
    val exP = countExchanges(q("p"))
    val tB = median((1 to runs).map(_ => time(q("b").collect())))
    val tP = median((1 to runs).map(_ => time(q("p").collect())))
    println(f"bucketed: median=$tB%.3f s exchanges=$exB")
    println(f"plain   : median=$tP%.3f s exchanges=$exP")
    spark.stop()
  }
}
