package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the companion to
  * [[Clustering]]'s connected components (dedup clusters); PageRank
  * ranks nodes by link structure (e.g. which suppliers a purchase graph
  * concentrates on, authority weighting for dedup keeper selection).
  *
  * Scale shape per iteration: ONE shuffle keyed by dst (the
  * contribution aggregate, partial+final) plus a join of the edge list
  * to the (nodes-sized) rank table — the rank table localCheckpoints
  * each round, the edge list is scanned from its own storage every
  * round and never materialized on the driver. Iterations are FIXED
  * (deterministic plans, SQL-replayable oracle), not convergence-tested:
  * at 100 TB you budget rounds, not epsilon.
  */
object Graph {

  /** PageRank over an UNDIRECTED graph (callers pass each edge once;
    * both directions are added here, so no dangling-mass correction is
    * needed — every node that appears has out-degree ≥ 1).
    *
    * Returns (node, pr) after exactly `iterations` rounds of
    * `pr'(v) = (1−d)/N + d · Σ_{u~v} pr(u)/deg(u)` from the uniform
    * start 1/N. */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val sym = edges
      .select(col(srcCol).alias("src"), col(dstCol).alias("dst"))
      .unionAll(edges.select(col(dstCol).alias("src"), col(srcCol).alias("dst")))
      .distinct()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).alias("deg"))
    val nodes = deg.select(col("src").alias("node"))
    // driver-free scalar N: broadcast one-row count, never .collect()
    val n = nodes.agg(count(lit(1)).alias("__n"))

    var pr = nodes.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("__n")).alias("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contribs = sym
        .join(deg, Seq("src"))
        .join(pr, col("src") === col("node"))
        .select(col("dst"), (col("pr") / col("deg")).alias("__c"))
        .groupBy(col("dst"))
        .agg(sum(col("__c")).alias("__in"))
      pr = nodes
        .join(contribs, col("node") === col("dst"), "left")
        .crossJoin(broadcast(n))
        .select(
          col("node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("__in"), lit(0.0))).alias("pr"))
        .localCheckpoint(true)
    }
    pr
  }
}
