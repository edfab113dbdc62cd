package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  import spark.implicits._

  private val docs = Seq((1L, "abcdefgh"), (2L, "x" * 100)).toDF("doc_id", "text")
  private def media = Multimodal.attachPayload(docs, "doc_id", "text", "fake/utf8")

  test("attachPayload: binary payload with byte-accurate metadata") {
    val rows = media.collect().map(r => r.getAs[Long]("media_id") ->
      (r.getAs[Array[Byte]]("payload"), r.getAs[Long]("n_bytes"))).toMap
    assert(new String(rows(1L)._1, "UTF-8") === "abcdefgh")
    assert(rows(1L)._2 === 8L)
    assert(rows(2L)._2 === 100L)
  }

  test("stub codec features are deterministic and shaped") {
    val f = Multimodal.stubDecodeFeatures("abcd".getBytes("UTF-8"))
    assert(f.length === 8)
    assert(f(0) === 4.0) // n
    assert(f(1) === 'a'.toDouble) // first byte
    assert(f(2) === 'd'.toDouble) // last byte
    assert(f(3) === ('a' + 'b' + 'c' + 'd').toDouble / 4) // mean
    assert(Multimodal.stubDecodeFeatures(Array.emptyByteArray).forall(_ === 0.0))
  }

  test("extractFeatures runs the typed mapPartitions batch path") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).features(0) === 8.0)
    assert(feats(2L).features(3) === 'x'.toDouble) // constant bytes → mean = x
    assert(feats(2L).features(4) === 0.0) // variance 0
  }

  test("resize stage decimates payloads deterministically and refreshes metadata") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    assert(Multimodal.stubResize("abcdefgh".getBytes("UTF-8"), 2).toSeq ===
      "aceg".getBytes("UTF-8").toSeq)
    assert(Multimodal.stubResize(Array.emptyByteArray, 2).isEmpty)
    val resized = Multimodal.resize(media, 4)
    val rows = resized.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(rows(2L).getAs[Long]("n_bytes_resized") === 25L) // 100 / 4
    assert(rows(1L).getAs[String]("media_type") === "fake/utf8;resized/4")
    assert(new String(rows(1L).getAs[Array[Byte]]("payload"), "UTF-8") === "ae") // every 4th of abcdefgh
  }

  test("frameSample/frameSlices: window offsets and slice sizes") {
    val frames = Multimodal.frameSlices(media, frameBytes = 32, stride = 16)
    val byId = frames.groupBy("media_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) === 1L) // shorter than one frame → single clamped frame
    assert(byId(2L) === 5L) // starts 1,17,33,49,65 (69 = 100-32+1)
    val full = frames.filter(col("media_id") === 2L && col("frame_idx") === 0).head()
    assert(full.getAs[Long]("frame_bytes") === 32L)
  }
}
