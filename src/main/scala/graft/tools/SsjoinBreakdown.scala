package graft.tools
import graft.sources.Tables
import graft.ops.Dedup
import org.apache.spark.sql.functions._
object SsjoinBreakdown {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("ssjoin-breakdown")
    val d = "/root/testdata/sf0.1"
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ssj] $name%-30s ${(System.nanoTime()-t0)/1e9}%7.3f s"); r
    }
    spark.range(1000000).selectExpr("id % 97 AS k").groupBy("k").count().count()
    val docs = Tables.documents(spark, d)
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val corpus = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        .select(col("doc_id"), col("text"))
        .unionAll(docs.filter(pmod(col("doc_id"), lit(10)) === 5)
          .select((col("doc_id") + 2000000000L).alias("doc_id"),
            concat(col("text"), lit(" zqxmutation")).alias("text")))
      val base = corpus.select(col("doc_id").alias("__id"),
        graft.functions.native.wordShingles(col("text"), 3).alias("__sh"))
        .filter(size(col("__sh")) > 0)
      val ex = base.select(col("__id"), explode(col("__sh")).alias("__tok"))
      timed("shingle explode count")(ex.count())
      val dfreq = ex.groupBy(col("__tok")).agg(count(lit(1)).alias("__df"))
      timed("dfreq")(dfreq.count())
      val ordered = ex.join(dfreq, "__tok").groupBy(col("__id"))
        .agg(sort_array(collect_list(struct(col("__df"), col("__tok")))).alias("__o"))
      timed("ordered (join+regroup)")(ordered.write.format("noop").mode("overwrite").save())
      timed("full prefixFilterJoin")(Dedup.prefixFilterJoin(corpus, "doc_id", "text", 0.7).count())
      timed("lsh nearDupPairs 0.8")(Dedup.nearDupPairs(corpus, "doc_id", "text", 0.8).count())
    }
    spark.stop()
  }
}
