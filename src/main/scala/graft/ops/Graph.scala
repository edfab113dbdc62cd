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
    // materialize the symmetrized edge list ONCE: `edges` is typically a
    // derived frame (a join + distinct), and every iteration references
    // sym — without the checkpoint the whole upstream join re-executes
    // per round (measured 4.0 s → 2.1 s on the bench purchase graph)
    val sym = edges
      .select(col(srcCol).alias("src"), col(dstCol).alias("dst"))
      .unionAll(edges.select(col(dstCol).alias("src"), col(srcCol).alias("dst")))
      .distinct()
      .localCheckpoint(true)
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

  /** Synchronous label propagation (community detection) over an
    * UNDIRECTED graph: every node starts labeled with its own id; each
    * round it adopts the most frequent label among its neighbors. Ties
    * break to the node's CURRENT label when that label is among the
    * tied-max candidates, else to the MINIMUM candidate — deterministic
    * and SQL-replayable (the textbook random tie-break is neither), and
    * the prefer-current rule stops a single bridge edge from flooding
    * its label through an all-ties clique (pure min tie-break degrades
    * to connected components). Iterations are FIXED like [[pageRank]]:
    * budget rounds, not convergence.
    *
    * Scale shape per round: one shuffle keyed (node, label) for the
    * neighbor-label histogram (partial-aggregated map-side), one keyed
    * node for the max count, then a same-key join back + one agg to
    * resolve the tie-break — no windows, no driver collects. The label
    * table localCheckpoints each round so lineage (and replanning)
    * doesn't grow with iterations. */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3): DataFrame = {
    // same once-only edge materialization as [[pageRank]]
    val sym = edges
      .select(col(srcCol).alias("src"), col(dstCol).alias("dst"))
      .unionAll(edges.select(col(dstCol).alias("src"), col(srcCol).alias("dst")))
      .distinct()
      .localCheckpoint(true)
    val nodes = sym.select(col("src").alias("node")).distinct()
    var lab = nodes.select(col("node"), col("node").alias("label"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val hist = sym
        .join(lab, col("dst") === col("node"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).alias("__cnt"))
      val best = hist.groupBy(col("src")).agg(max(col("__cnt")).alias("__mx"))
      lab = hist
        .join(best, Seq("src"))
        .filter(col("__cnt") === col("__mx"))
        .join(lab.select(col("node"), col("label").alias("__cur")),
          col("src") === col("node"))
        .groupBy(col("src"))
        .agg(coalesce(
          max(when(col("label") === col("__cur"), col("label"))),
          min(col("label"))).alias("label"))
        .select(col("src").alias("node"), col("label"))
        .localCheckpoint(true)
    }
    lab
  }
}
