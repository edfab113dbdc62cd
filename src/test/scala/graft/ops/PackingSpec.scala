package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Greedy sequence packing and sliding-window chunking. */
class PackingSpec extends SparkSuite {

  import spark.implicits._

  test("packGreedy: greedy fill with reset, oversized row gets its own bin") {
    val docs = Seq(
      ("a", 1L, 50L), ("a", 2L, 60L), ("a", 3L, 30L), // 50+60=110, +30 breaks
      ("a", 4L, 200L),                                // oversized: own bin
      ("a", 5L, 10L),
      ("b", 1L, 128L), ("b", 2L, 1L)                  // exact fit, then break
    ).toDF("src", "id", "len")
    val out = Packing.packGreedy(docs, "src", "id", "len", 128L)
      .orderBy(col("src"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("a", 1L, 0L, 50L), ("a", 2L, 0L, 110L), ("a", 3L, 1L, 30L),
      ("a", 4L, 2L, 200L), ("a", 5L, 3L, 10L),
      ("b", 1L, 0L, 128L), ("b", 2L, 1L, 1L)))
  }

  test("packGreedy: no bin exceeds budget unless it holds a single oversized row") {
    val docs = spark.range(1000).select(
      (col("id") % 7).cast("string").alias("src"), col("id"),
      (pmod(col("id") * 31, lit(40)) + 1).alias("len"))
    val bins = Packing.packGreedy(docs, "src", "id", "len", 100L)
      .groupBy(col("src"), col("bin_id"))
      .agg(sum(col("len")).alias("total"), count(lit(1)).alias("n"))
      .filter(col("total") > 100 && col("n") > 1)
    assert(bins.count() === 0, "a multi-row bin exceeded the budget")
  }

  test("packGreedy: partitioning-invariant (groups are re-collected by the repartition)") {
    val docs = spark.range(500).select(
      (col("id") % 5).cast("string").alias("src"), col("id"),
      (pmod(col("id") * 17, lit(60)) + 1).alias("len"))
    val a = Packing.packGreedy(docs, "src", "id", "len", 128L)
    val b = Packing.packGreedy(docs.repartition(11), "src", "id", "len", 128L)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("chunk: windows cover every token, overlap is size - stride, tail may be short") {
    val docs = Seq((1L, (1 to 55).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "doc_id", "text", size = 32, stride = 24)
      .orderBy(col("chunk_idx")).collect()
    // 55 tokens, size 32, stride 24: chunks at 0 (32 toks) and 24 (31 toks)
    assert(out.length === 2)
    assert(out(0).getInt(2) === 32 && out(1).getInt(2) === 31)
    val c0 = out(0).getString(3).split(" ")
    val c1 = out(1).getString(3).split(" ")
    assert(c0.head === "t1" && c0.last === "t32")
    assert(c1.head === "t25" && c1.last === "t55") // 8-token overlap
    assert((c0 ++ c1).toSet === (1 to 55).map(i => s"t$i").toSet)
  }

  test("chunk: a document shorter than one window yields exactly one short chunk") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "doc_id", "text", size = 32, stride = 24).collect()
    assert(out.length === 1 && out(0).getInt(2) === 3 && out(0).getString(3) === "a b c")
  }

  test("content-defined chunks: cover every token, edit-stable after the first boundary, fixed-stride is not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val seed = new scala.util.Random(42)
    val words = (1 to 400).map(_ => ('a' + seed.nextInt(26)).toChar.toString * (1 + seed.nextInt(5)))
    val original = words.mkString(" ")
    val edited = "zzz " + original // one token inserted at the front
    val docs = Seq((1L, original), (2L, edited)).toDF("doc_id", "text")
    val chunks = TextAnalysis.contentDefinedChunks(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))

    // coverage: chunk token counts sum to the doc's token count
    assert(chunks.filter(_._1 == 1L).map(_._3).sum === 400)
    assert(chunks.filter(_._1 == 2L).map(_._3).sum === 401)

    // edit-stability: every chunk of the ORIGINAL except its first also
    // appears, digest-identical, in the EDITED doc — the insertion only
    // disturbed the region before the first boundary
    val origDigests = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._4)
    val editDigests = chunks.filter(_._1 == 2L).map(_._4).toSet
    assert(origDigests.length > 3, s"want several chunks, got ${origDigests.length}")
    val surviving = origDigests.drop(1).count(editDigests.contains)
    assert(surviving === origDigests.length - 1,
      s"only $surviving of ${origDigests.length - 1} post-edit chunks survived")

    // the contrast that motivates the operator: fixed-stride chunking
    // shifts EVERY chunk after a front insertion
    val fixed = TextAnalysis.chunk(docs, "doc_id", "text", size = 32, stride = 32)
      .withColumn("d", md5(col("chunk_text")))
      .collect().map(r => (r.getLong(0), r.getAs[String]("d")))
    val f1 = fixed.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fixed.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 & f2).size <= 1, s"fixed-stride unexpectedly stable: ${(f1 & f2).size}")
  }

  test("bm25: higher tf scores higher within a document; rare terms outscore common ones") {
    val docs = Seq(
      (1L, "apple apple apple banana common"),
      (2L, "cherry banana common"),
      (3L, "durian common common")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getDouble(3))).toMap
    // within doc 1: tf(apple)=3 > tf(banana)=1, same df=... apple df=1 < banana df=2
    assert(out((1L, "apple")) > out((1L, "banana")))
    // rare (df=1) beats common (df=3) at equal tf in the same doc
    assert(out((2L, "cherry")) > out((2L, "common")))
    // idf is the Lucene +1 form: never negative even for ubiquitous terms
    assert(out.values.forall(_ >= 0.0))
  }
}
