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

  // deterministic 4x2 test image: known solid colors per pixel column
  private def testImage(format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)(x))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos))
    bos.toByteArray
  }

  test("real PNG decode: golden pixel-moment features") {
    val f = Multimodal.decodeImageFeatures(testImage("png")).get
    assert(f.length === 8)
    assert(f(0) === 4.0 && f(1) === 2.0 && f(2) === 8.0) // w, h, n_pixels
    // per row: red, green, blue, white pixels -> channel means are exact
    assert(f(3) === (255.0 + 0 + 0 + 255) / 4) // mean R = 127.5
    assert(f(4) === (0.0 + 255 + 0 + 255) / 4) // mean G
    assert(f(5) === (0.0 + 0 + 255 + 255) / 4) // mean B
    // Rec.601 luma of the four colors, exact arithmetic
    val lumas = Seq(0.299 * 255, 0.587 * 255, 0.114 * 255, 255.0)
    val meanY = lumas.sum / 4
    assert(math.abs(f(6) - meanY) < 1e-9)
    assert(math.abs(f(7) - (lumas.map(l => l * l).sum / 4 - meanY * meanY)) < 1e-9)
  }

  test("JPEG decodes through the same path; non-image bytes fall back to the stub") {
    val jpegF = Multimodal.decodeImageFeatures(testImage("jpg")).get
    assert(jpegF(0) === 4.0 && jpegF(1) === 2.0) // geometry survives lossy encode
    assert(Multimodal.decodeImageFeatures("not an image".getBytes("UTF-8")).isEmpty)
    // dispatch: image/* with undecodable bytes degrades to the stub
    val garbage = "garbage".getBytes("UTF-8")
    assert(Multimodal.decodeFeatures("image/png", garbage)
      sameElements Multimodal.stubDecodeFeatures(garbage))
    assert(Multimodal.decodeFeatures("fake/utf8", garbage)
      sameElements Multimodal.stubDecodeFeatures(garbage))
  }

  test("extractFeatures over real encoded images: distributed decode, golden values") {
    val png = testImage("png")
    val rows = Seq(
      (10L, "image/png", png),
      (11L, "text/plain", "hello".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("digest", md5(col("payload")))
    val feats = Multimodal.extractFeatures(rows)(spark)
      .collect().map(f => f.media_id -> f.features).toMap
    assert(feats(10L).take(3).toSeq === Seq(4.0, 2.0, 8.0))
    assert(feats(10L)(3) === 127.5)
    assert(feats(11L) sameElements Multimodal.stubDecodeFeatures("hello".getBytes("UTF-8")))
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

  test("real WAV decode: golden signal moments from known samples") {
    // samples: [1000, -1000, 0, 500] — hand-computable moments
    val wav = Multimodal.wavBytes(Array[Short](1000, -1000, 0, 500), 8000)
    val f = Multimodal.decodeAudioFeatures(wav).get
    assert(f(0) === 8000.0) // sample rate
    assert(f(1) === 1.0) // channels
    assert(f(2) === 4.0) // frames
    assert(f(3) === 4 / 8000.0) // duration
    assert(f(4) === 1000.0 / 32768.0) // peak
    val ssq = 1000.0 * 1000 + 1000.0 * 1000 + 0 + 500.0 * 500
    assert(f(5) === math.sqrt(ssq / 4) / 32768.0) // rms
    assert(f(6) === (500.0 / 4) / 32768.0) // mean
    assert(f(7) === 2.0 / 3.0) // sign changes: +→−, −→0+ (0 is non-negative), 0→+ no change at 500? (1000,-1000):1, (-1000,0):1, (0,500):0 → 2/3
  }

  test("WAV roundtrip recovers PCM exactly: encode → decode is lossless") {
    val rnd = new scala.util.Random(7)
    val smp = Array.fill(1024)((rnd.nextInt(65536) - 32768).toShort)
    val f = Multimodal.decodeAudioFeatures(Multimodal.wavBytes(smp, 16000)).get
    var sum = 0L; var ssq = 0L; var pk = 0L
    smp.foreach { s => sum += s; ssq += s.toLong * s; pk = math.max(pk, math.abs(s.toLong)) }
    assert(f(2) === 1024.0)
    assert(f(4) === pk / 32768.0)
    assert(f(5) === math.sqrt(ssq.toDouble / 1024) / 32768.0)
    assert(f(6) === (sum.toDouble / 1024) / 32768.0)
  }

  test("audio dispatch: audio/* decodes really; non-audio bytes fall back to the stub") {
    val wav = Multimodal.wavBytes(Array[Short](100, -100), 8000)
    assert(Multimodal.decodeFeatures("audio/wav", wav)(0) === 8000.0)
    val junk = "not a riff header at all".getBytes("UTF-8")
    assert(Multimodal.decodeAudioFeatures(junk).isEmpty)
    assert(Multimodal.decodeFeatures("audio/wav", junk).toSeq ===
      Multimodal.stubDecodeFeatures(junk).toSeq)
    // and an image payload routed as audio also falls back, not crashes
    assert(Multimodal.decodeFeatures("video/mp4", wav).toSeq ===
      Multimodal.stubDecodeFeatures(wav).toSeq)
  }

  test("extractFeatures decodes audio distributed (mapPartitions path)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val rows = (0L until 8L).map { k =>
      val smp = Array.tabulate(64)(i => ((k * 7 + i * 13) % 201 - 100).toShort)
      (k, "audio/wav", Multimodal.wavBytes(smp, 8000))
    }
    val df = rows.toDF("media_id", "media_type", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("digest", md5(col("payload")))
      .repartition(4)
    val feats = Multimodal.extractFeatures(df).collect()
      .map(f => f.media_id -> f.features).toMap
    assert(feats.size === 8)
    rows.foreach { case (k, _, _) =>
      assert(feats(k)(2) === 64.0, s"media $k frame count")
      assert(feats(k)(0) === 8000.0)
    }
  }

  test("animated GIF: frame sequence round-trips bit-exactly, stride sampling, non-GIF rejected") {
    // encode 4 constant-gray frames, decode all back exactly
    val grays = Seq(0, 85, 170, 255)
    val gif = Multimodal.gifBytes(grays.map(g => Multimodal.grayFrame(6, 4, g)))
    val frames = Multimodal.decodeGifFrames(gif).get
    assert(frames.size === 4)
    frames.zip(grays).foreach { case (f, g) =>
      assert(f.width === 6 && f.height === 4)
      assert(f.gray_mean === g.toDouble, s"frame ${f.frame_idx}: lossless round-trip must be exact")
    }
    // non-GIF payloads are rejected, not mis-decoded
    assert(Multimodal.decodeGifFrames("not a gif".getBytes).isEmpty)
    assert(Multimodal.decodeGifFrames(Array.emptyByteArray).isEmpty)

    // distributed stride sampling keeps frames 0 and 2
    import spark.implicits._
    val media = Seq((7L, "image/gif-anim", gif)).toDF("media_id", "media_type", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("digest", md5(col("payload")))
    val sampled = Multimodal.sampleFrames(media, stride = 2)(spark)
      .collect().map(r => (r.getAs[Int]("frame_idx"), r.getAs[Double]("gray_mean"), r.getAs[Int]("n_frames")))
    assert(sampled.toSeq.sorted === Seq((0, 0.0, 4), (2, 170.0, 4)))
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
