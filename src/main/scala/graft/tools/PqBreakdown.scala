package graft.tools
import graft.sources.Tables
import org.apache.spark.sql.functions._
object PqBreakdown {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("pq-breakdown")
    val d = "/root/testdata/sf0.1"
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pq] $name%-28s ${(System.nanoTime()-t0)/1e9}%7.3f s"); r
    }
    spark.range(1000000).selectExpr("id % 97 AS k").groupBy("k").count().count()
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val emb = Tables.embeddings(spark, d)
      val n = timed("emb.count")(emb.count())
      val ksub = graft.ops.Pq.resolutionScaledKsub(n)
      val cb = timed("trainCodebook(3 iters)")(
        graft.ops.Pq.trainCodebook(emb, "vec_id", "embedding", 16, ksub))
      timed("encode.count")(graft.ops.Pq.encode(emb, "vec_id", "embedding", cb, 16).count())
      timed("adcTopK full")(graft.ops.Pq.adcTopK(emb, "vec_id", "embedding", Seq(0L,1L,2L,3L,4L), 10, ksub = ksub).count())
      timed("bruteTopK")(graft.ops.Similarity.bruteTopK(emb, "vec_id", "embedding", Seq(0L,1L,2L,3L,4L), 1).count())
      timed("full eq_pq_recall")(graft.SparkEntry.queries("eq_pq_recall")(spark, d).count())
    }
    spark.stop()
  }
}
