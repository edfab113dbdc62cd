package graft.ops

import graft.functions.native
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse quantizer
  * partitions the corpus into cells; queries probe only the closest
  * `nProbe` cells.
  *
  * Scale shape: centroid assignment is a broadcast nested-loop of the
  * corpus against the (small, driver-collected) centroid set — linear in
  * corpus size, no shuffle of the big side — followed by one windowed
  * argmax per vector. Search touches `nProbe / nCells` of the corpus per
  * query, shuffled once on cell id. The cell table is exactly the
  * "inverted file": at 100 TB it would be written bucketed by cell id so
  * probes become partition-pruned scans.
  *
  * Centroid choice is deterministic (first `nCells` ids): a coarse
  * quantizer needs spread, not optimality, and determinism matters more
  * here than k-means polish — swap in refined centroids without touching
  * the search path.
  */
object Ivf {

  /** Native single-pass L2 normalize; NULL for zero vectors (callers
    * drop them explicitly rather than propagate NaN cosines). */
  private def norml2(v: Column): Column = native.l2normalize(v)

  /** Assign every vector to its nearest centroid (by cosine, i.e. dot of
    * normalized vectors). Zero vectors (no direction, NaN cosine) are
    * dropped at entry. Returns (id, cell, vector) rows. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String, nCells: Int): DataFrame = {
    val normed = corpus.select(
      col(idCol).alias("__id"),
      norml2(col(vecCol).cast("array<double>")).alias("__v"))
      .filter(col("__v").isNotNull)
    val cents = broadcast(
      normed.orderBy(col("__id")).limit(nCells)
        .select(col("__id").alias("cell"), col("__v").alias("__cv")))
    normed
      .join(cents) // broadcast nested loop: |corpus| × nCells, no shuffle of corpus
      .withColumn("__sim", native.dotProduct(col("__v"), col("__cv")))
      .withColumn("__rk", row_number().over(Window.partitionBy(col("__id")).orderBy(col("__sim").desc, col("cell"))))
      .filter(col("__rk") === 1)
      .select(col("__id"), col("cell"), col("__v"))
  }

  /** IVF top-k: probe the `nProbe` closest cells per query, exact-rank
    * within them. Output (q_id, rnk, n_id, sim) like the other ANN paths. */
  def topK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int,
      nCells: Int = 32,
      nProbe: Int = 8): DataFrame = {
    val assigned = assign(corpus, idCol, vecCol, nCells)

    // centroid vectors: the first nCells ids themselves
    val centroids = broadcast(
      corpus.select(col(idCol).alias("cell"), norml2(col(vecCol).cast("array<double>")).alias("__cv"))
        .filter(col("__cv").isNotNull)
        .orderBy(col("cell")).limit(nCells))

    val queries = assigned.filter(col("__id").isin(queryIds: _*))
      .select(col("__id").alias("q_id"), col("__v").alias("__qv"))

    // probe list: nProbe closest centroids per query
    val probes = queries
      .join(centroids)
      .withColumn("__sim", native.dotProduct(col("__qv"), col("__cv")))
      .withColumn("__rk", row_number().over(Window.partitionBy(col("q_id")).orderBy(col("__sim").desc, col("cell"))))
      .filter(col("__rk") <= nProbe)
      .select(col("q_id"), col("__qv"), col("cell"))

    probes
      .join(assigned.select(col("cell"), col("__id").alias("n_id"), col("__v").alias("__nv")), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", native.dotProduct(col("__qv"), col("__nv")))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }
}
