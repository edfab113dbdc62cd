package graft.tools
import graft.store.SnapshotStore
import org.apache.spark.sql.functions._
/** Connector-vs-native scan tax probe: same files, same aggregate,
  * DSv2 snapshot scan vs spark.read.parquet. */
object ConnTax {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("graft-conntax")
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(32)
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val t = java.nio.file.Files.createTempDirectory("conntax").toString + "/t"
    SnapshotStore.commit(
      graft.sources.Tables.orders(spark, sfDir).repartition(nFiles), t)
    val m = SnapshotStore.manifest(spark, t, SnapshotStore.currentVersion(spark, t).get)
    def agg(df: org.apache.spark.sql.DataFrame): Double = time {
      df.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)), sum(round(col("o_totalprice") * 100).cast("long")),
          avg(length(col("o_orderpriority")))).collect()
    }
    def conn() = spark.read.format("graft-snapshot").option("path", t).load()
    def nat() = spark.read.parquet(m.data)
    agg(conn()); agg(nat())
    val c = median((1 to 7).map(_ => agg(conn())))
    val n = median((1 to 7).map(_ => agg(nat())))
    // planning-only component
    def planOnly(df: org.apache.spark.sql.DataFrame): Double =
      time(df.groupBy(col("o_orderstatus")).agg(count(lit(1))).queryExecution.executedPlan)
    val cp = median((1 to 7).map(_ => planOnly(conn())))
    val np = median((1 to 7).map(_ => planOnly(nat())))
    println(f"[conntax] files=$nFiles conn=$c%.3f native=$n%.3f tax=${c / n}%.2fx " +
      f"connPlan=$cp%.3f nativePlan=$np%.3f")
  }
}
