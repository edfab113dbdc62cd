package graft.tools

import graft.{Sessions, SparkEntry}
import graft.ops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the LSH dedup pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .unionAll(Tables.documents(spark, d).filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 100000).alias("doc_id"), col("text")))

    timed("docs scan")(docs.count())
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).alias("sh"))
    timed("shingles")(sh.count())
    timed("shingles (again)")(sh.count())
    val sig = sh.select(col("doc_id"),
      graft.functions.native.minhashSignature(col("sh"), 64).alias("sig"))
    timed("signatures")(sig.count())
    val cands = Dedup.lshCandidatePairs(docs, "doc_id", "text")
    cands.explain("formatted")
    timed("candidate pairs")(cands.count())
    timed("full dd_minhash_lsh query")(SparkEntry.queries("dd_minhash_lsh")(spark, d).count())
    timed("full dd_neardup query")(SparkEntry.queries("dd_neardup_jaccard")(spark, d).count())
    spark.stop()
  }
}
