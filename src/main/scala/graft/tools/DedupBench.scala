package graft.tools

import org.apache.spark.sql.functions._

/** A/B harness for the near-dup family: times pair generation and
  * connected components separately, repeated, on one JVM — the bench
  * corpus numbers alone can't attribute a regression to either half.
  * Usage: runMain graft.tools.DedupBench [sfDir] [reps]
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.local("graft-dedup-bench")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // the dd_* queries' near-dup corpus: odd-id originals ∪ mutated copies
    val corpus = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("text"))
      .unionAll(
        docs.filter(pmod(col("doc_id"), lit(10)) === 5)
          .select((col("doc_id") + 2000000000L).alias("doc_id"),
            concat(col("text"), lit(" zqxmutation")).alias("text")))
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm-up
    corpus.limit(10).count()
    val pairTimes = (1 to reps).map { _ =>
      time(graft.ops.Dedup.nearDupPairs(corpus, "doc_id", "text", 0.8).count())
    }
    val pairs = graft.ops.Dedup.nearDupPairs(corpus, "doc_id", "text", 0.8)
      .select(col("id1"), col("id2")).localCheckpoint(true)
    val ccTimes = (1 to reps).map { _ =>
      time(graft.ops.Clustering.connectedComponents(pairs).count())
    }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(",")
    println(s"""{"pairs_sec":[${fmt(pairTimes)}],"cc_sec":[${fmt(ccTimes)}],"n_pairs":${pairs.count()},"sf":"$sfDir"}""")
    spark.stop()
  }
}
