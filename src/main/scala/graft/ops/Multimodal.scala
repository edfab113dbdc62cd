package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side machinery — schema, partitioning, typed batch shape —
  * is real and tested; the *codec* itself is a clearly-marked
  * deterministic STUB (this container has no image/audio libraries), so a
  * production deployment swaps exactly one function.
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

  /** Feature extraction as a typed mapPartitions batch (the Scala analog
    * of `mapInPandas`): partition-at-a-time, codec invoked per item, no
    * shuffle. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select("media_id", "media_type", "payload", "n_bytes", "digest")
      .as[MediaItem]
      .mapPartitions(_.map(m =>
        MediaFeatures(m.media_id, m.media_type, m.n_bytes, stubDecodeFeatures(m.payload))))
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
