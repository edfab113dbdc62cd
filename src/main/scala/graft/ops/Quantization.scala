package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding compression for vector corpora: per-vector symmetric int8
  * scalar quantization (the standard 4× shrink before ANN indexing —
  * at 100 TB of embeddings the index that fits in executor memory is the
  * one that got quantized).
  *
  * scale = max(|v|) / 127; q[i] = round(v[i] / scale) ∈ [-127, 127] by
  * construction (no clamp needed); dequantization is q[i]·scale. Pure
  * higher-order expressions, no UDFs, no shuffle.
  *
  * Plan note: `scale` is projected as its own OUTPUT column (not only
  * referenced inside the quantize lambda) — multiply-referenced non-cheap
  * expressions stay in their own projection under CollapseProject, so the
  * max-abs pass runs once per vector, not once per element.
  */
object Quantization {

  /** (id, scale, q) rows: per-vector scale + int8 codes. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").alias("__v"))
      .withColumn("scale",
        greatest(array_max(transform(col("__v"), x => abs(x))), lit(1e-12)) / 127.0)
      .withColumn("q", transform(col("__v"), x => round(x / col("scale")).cast("int")))

  /** Quantization quality audit: per-vector max absolute reconstruction
    * error (should be ≤ scale/2 by construction — the entry's invariant). */
  def reconstructionError(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    quantizeInt8(df, idCol, vecCol)
      .withColumn("max_err",
        array_max(zip_with(col("__v"), col("q"), (x, qq) => abs(x - qq * col("scale")))))
      .select(col(idCol), col("scale"), col("max_err"))
}
