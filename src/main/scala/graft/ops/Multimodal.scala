package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side machinery — schema, partitioning, typed batch shape —
  * is real and tested. The IMAGE codec is real too: `image/…` payloads
  * decode through `javax.imageio` (JDK built-in JPEG/PNG/GIF/BMP — no
  * native deps) into pixel-moment features. Audio/video decode remains a
  * clearly-marked deterministic STUB (no such codec ships in the JDK),
  * so a production deployment swaps exactly one function per modality.
  *
  * Scale notes: payload bytes ride along narrow transformations only —
  * nothing here shuffles a payload. Feature extraction runs as a typed
  * `mapPartitions` (one JVM pass per partition, the Scala analog of a
  * Pandas-UDF batch), and frame sampling is a generator expression whose
  * output rows carry slices, not copies of the whole payload.
  */
object Multimodal {

  /** A media row: payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      media_type: String,
      payload: Array[Byte],
      n_bytes: Long,
      digest: String)

  /** Extracted feature record (fixed-width vector + provenance). */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      features: Array[Double])

  /** Attach a binary payload column + metadata struct to any table with a
    * text column (the test corpus's stand-in for raw media bytes). */
  def attachPayload(df: DataFrame, idCol: String, textCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").alias("media_id"),
      lit(mediaType).alias("media_type"),
      col(textCol).cast("binary").alias("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("digest", md5(col("payload")))

  /** STUB CODEC — stands in for image/audio decode (no codec libraries in
    * this container). Deterministic features from raw bytes: length,
    * first/last byte, simple byte-histogram moments. A real deployment
    * replaces ONLY this function with e.g. a JPEG decode + embedding. */
  def stubDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) return Array.fill(8)(0.0)
    val n = payload.length.toDouble
    var sum = 0.0
    var sumSq = 0.0
    payload.foreach { b => val v = (b & 0xff).toDouble; sum += v; sumSq += v * v }
    val mean = sum / n
    val variance = sumSq / n - mean * mean
    Array(n, (payload.head & 0xff).toDouble, (payload.last & 0xff).toDouble,
      mean, variance, sum % 251.0, sumSq % 251.0, (payload.length % 64).toDouble)
  }

  /** REAL image decode via `javax.imageio` (JDK built-in — JPEG, PNG,
    * GIF, BMP; no native deps, works in this container). 8-dim
    * deterministic pixel-moment vector: width, height, n_pixels, mean
    * red, mean green, mean blue, luminance mean, luminance variance
    * (Rec.601 luma). Returns None when the payload is not a decodable
    * image — the caller falls back to [[stubDecodeFeatures]], which
    * remains the stand-in for media types without a JDK codec (audio,
    * video). Exact for lossless formats, so PNG features are golden-
    * testable; JPEG decode is deterministic for a given JDK. */
  def decodeImageFeatures(payload: Array[Byte]): Option[Array[Double]] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val n = w.toLong * h
    var sr, sg, sb, sy, syy = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sy += luma; syy += luma * luma
        x += 1
      }
      y += 1
    }
    val meanY = sy / n
    Some(Array(w.toDouble, h.toDouble, n.toDouble,
      sr / n, sg / n, sb / n, meanY, syy / n - meanY * meanY))
  }

  /** REAL audio decode via `javax.sound.sampled` (JDK built-in — WAV /
    * AIFF / AU container parsing + PCM frames; no native deps, works in
    * this container). 8-dim deterministic signal-moment vector:
    *
    *   [sample_rate, channels, n_frames, duration_s,
    *    peak, rms, mean, zero_crossing_rate]
    *
    * peak/rms/mean are in normalized full-scale units (sample /
    * 2^(bits−1)); zcr counts sign-boundary transitions over successive
    * samples / (n−1). Every statistic accumulates in EXACT integer
    * arithmetic (Long sums of the raw PCM ints) with one final float
    * division — so the features are bit-reproducible and replayable by
    * an oracle that knows the generating samples. Supports PCM_SIGNED
    * 8/16-bit (the WAV formats the JDK itself writes); returns None on
    * anything else — caller falls back to [[stubDecodeFeatures]].
    * Multi-channel streams are analyzed over the interleaved sample
    * sequence (channel count is reported for downstream splitting). */
  def decodeAudioFeatures(payload: Array[Byte]): Option[Array[Double]] = {
    if (payload == null || payload.isEmpty) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val ok = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        (bits == 8 || bits == 16)
      if (!ok) return None
      val raw = ais.readAllBytes()
      val bytesPer = bits / 8
      val n = raw.length / bytesPer
      if (n == 0) return None
      val fullScale = (1 << (bits - 1)).toDouble
      var sum = 0L
      var sumSq = 0L
      var peak = 0L
      var zc = 0L
      var prevNeg = false
      var i = 0
      while (i < n) {
        val s: Int =
          if (bits == 16) {
            val lo = raw(2 * i) & 0xff
            val hi = raw(2 * i + 1).toInt
            if (fmt.isBigEndian) (raw(2 * i).toInt << 8) | (raw(2 * i + 1) & 0xff)
            else (hi << 8) | lo
          } else raw(i).toInt
        sum += s
        sumSq += s.toLong * s
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        val neg = s < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      val frames = n / fmt.getChannels
      Some(Array(
        fmt.getSampleRate.toDouble,
        fmt.getChannels.toDouble,
        frames.toDouble,
        frames / fmt.getSampleRate.toDouble,
        peak.toDouble / fullScale,
        math.sqrt(sumSq.toDouble / n) / fullScale,
        (sum.toDouble / n) / fullScale,
        if (n > 1) zc.toDouble / (n - 1) else 0.0))
    } finally ais.close()
  }

  /** Encode 16-bit mono PCM samples as a WAV payload (via the JDK's own
    * WAVE writer) — the deterministic fixture generator for audio-column
    * tests and queries: real bytes, real header, real decode path. */
  def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** One decoded animation frame: index, geometry, mean gray level. */
  final case class FrameInfo(frame_idx: Int, width: Int, height: Int, gray_mean: Double)

  /** REAL multi-frame decode (animated GIF via the JDK's `ImageIO`
    * `ImageReader` sequence API — no native deps). This is the "video"
    * modality made real for the one animated container the JDK can
    * parse: per-frame pixel planes, frame count, per-frame moments.
    * GIF is palette-indexed and LOSSLESS, so constant-tone test frames
    * round-trip bit-exactly — which lets the oracle verify decoded
    * frame means against the generating formula, the same trick as the
    * WAV path. Returns None when the payload isn't a GIF stream. */
  def decodeGifFrames(payload: Array[Byte]): Option[Seq[FrameInfo]] = {
    if (payload == null || payload.isEmpty) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      if (!reader.getFormatName.equalsIgnoreCase("gif")) return None
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      val out = (0 until n).map { i =>
        val img = reader.read(i)
        val w = img.getWidth
        val h = img.getHeight
        var sy = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            // grayscale fixtures: r == g == b; use the green channel
            sy += ((rgb >> 8) & 0xff).toDouble
            x += 1
          }
          y += 1
        }
        FrameInfo(i, w, h, sy / (w.toLong * h))
      }
      reader.dispose()
      Some(out)
    } catch {
      case _: java.io.IOException => None
    } finally iis.close()
  }

  /** Animated-GIF fixture encoder through the JDK's own writer
    * (`writeToSequence`) — the test-side twin of [[decodeGifFrames]],
    * like [[wavBytes]] for audio. */
  def gifBytes(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { img =>
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    baos.toByteArray
  }

  /** A constant-gray frame (palette of one color → exact round-trip). */
  def grayFrame(width: Int, height: Int, gray: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(gray, gray, gray))
    g2.fillRect(0, 0, width, height)
    g2.dispose()
    img
  }

  /** Frame-sampling stage over animated media: decode, keep every
    * `stride`-th frame, one output row per sampled frame. Runs as the
    * same typed mapPartitions batch as [[extractFeatures]] — payloads
    * never shuffle; output rows carry moments, not pixels. */
  def sampleFrames(media: DataFrame, stride: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media
      .select("media_id", "media_type", "payload", "n_bytes", "digest")
      .as[MediaItem]
      .mapPartitions(_.flatMap { m =>
        decodeGifFrames(m.payload).toSeq.flatMap { frames =>
          frames.filter(_.frame_idx % stride == 0).map(f =>
            (m.media_id, f.frame_idx, f.width, f.height, f.gray_mean, frames.size))
        }
      })
      .toDF("media_id", "frame_idx", "width", "height", "gray_mean", "n_frames")
  }

  /** Codec dispatch: `image/…` payloads get the real `javax.imageio`
    * decode, `audio/…` the real `javax.sound.sampled` decode (stub
    * fallback on undecodable bytes in both cases); every other media
    * type — video, for which the JDK ships no codec — uses the
    * deterministic stub. */
  def decodeFeatures(mediaType: String, payload: Array[Byte]): Array[Double] =
    if (mediaType != null && mediaType.startsWith("image/"))
      decodeImageFeatures(payload).getOrElse(stubDecodeFeatures(payload))
    else if (mediaType != null && mediaType.startsWith("audio/"))
      decodeAudioFeatures(payload).getOrElse(stubDecodeFeatures(payload))
    else stubDecodeFeatures(payload)

  /** Feature extraction as a typed mapPartitions batch (the Scala analog
    * of `mapInPandas`): partition-at-a-time, codec invoked per item, no
    * shuffle. Dispatches per media_type ([[decodeFeatures]]): real image
    * decode for `image/…`, deterministic stub otherwise. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select("media_id", "media_type", "payload", "n_bytes", "digest")
      .as[MediaItem]
      .mapPartitions(_.map(m =>
        MediaFeatures(m.media_id, m.media_type, m.n_bytes, decodeFeatures(m.media_type, m.payload))))
  }

  /** STUB RESIZE — stands in for image resampling (no codec libraries in
    * this container): deterministic byte decimation keeping every
    * `factor`-th byte. A real deployment replaces ONLY this function with
    * decode → pixel resample → re-encode. The Spark-side shape — a narrow
    * binary→binary projection with metadata refresh — is the real thing. */
  def stubResize(payload: Array[Byte], factor: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty || factor <= 1) return payload
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Resize stage over a media table: payload → resized payload, metadata
    * (n_bytes, digest) recomputed, original size kept for provenance. */
  def resize(media: DataFrame, factor: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media
      .select("media_id", "media_type", "payload", "n_bytes", "digest")
      .as[MediaItem]
      .mapPartitions(_.map { m =>
        val p = stubResize(m.payload, factor)
        MediaItem(m.media_id, m.media_type + s";resized/$factor", p, p.length.toLong, m.digest)
      })
      .toDF()
      .withColumnRenamed("n_bytes", "n_bytes_resized")
      .withColumn("digest", md5(col("payload")))
  }

  /** Frame sampling for "video" payloads: fixed-size windows every
    * `stride` bytes, exploded one row per frame. Pure generator expression
    * — each output row holds only its slice. */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn(
        "__starts",
        sequence(lit(1), greatest(col("n_bytes").cast("int") - frameBytes + 1, lit(1)), lit(stride)))
      .select(
        col("media_id"),
        col("media_type"),
        posexplode(col("__starts")).as(Seq("frame_idx", "__start")))
      .withColumn("frame_start", col("__start").cast("long"))
      .drop("__start")

  /** Frame payload slices (kept separate from [[frameSample]] so callers
    * that only need offsets never materialize slices). */
  def frameSlices(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn(
        "__starts",
        sequence(lit(1), greatest(col("n_bytes").cast("int") - frameBytes + 1, lit(1)), lit(stride)))
      .select(col("media_id"), col("payload"), posexplode(col("__starts")).as(Seq("frame_idx", "__start")))
      .withColumn("frame", expr(s"substring(payload, __start, $frameBytes)"))
      .withColumn("frame_bytes", octet_length(col("frame")).cast("long"))
      .drop("payload", "__start")
}
