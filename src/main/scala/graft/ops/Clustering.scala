package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-pair → cluster → keeper: the step between near-dup PAIR
  * detection ([[Dedup.nearDupPairs]], [[Similarity.cosineNearDupPairs]])
  * and actually dropping rows from a corpus. Transitivity matters: A~B
  * and B~C must collapse to ONE cluster even when A~C was never emitted
  * as a pair, so dedup keeps exactly one representative per group.
  *
  * Connected components run as iterative min-label propagation over the
  * pair list with pointer jumping: each round a vertex adopts the
  * smallest label among itself and its neighbors, then compresses by
  * adopting its label's label (labels only decrease, so label-of-label
  * never increases). At the fixpoint every edge joins two equal labels ⇒
  * labels are constant per component and equal to the component's
  * minimum id — which makes keeper selection free (keeper ⇔ id == label).
  *
  * Scale shape: the iteration runs over the PAIR table, which is
  * LSH-bounded (bucket-capped candidate generation) and therefore tiny
  * relative to the corpus — the 100 TB corpus itself is touched exactly
  * once, by one final left-anti join in [[dropNonKeepers]]. Each round is
  * two shuffle-joins + one aggregate; the jump step halves the distance
  * to the component minimum each round, so rounds needed is
  * O(log diameter), not diameter — a drifting near-copy CHAIN thousands
  * of hops long still converges inside the default budget. Lineage is
  * truncated per round with `localCheckpoint`, so iteration N does not
  * replay rounds 1..N-1.
  */
object Clustering {

  /** Connected components of the undirected graph given as (id1, id2)
    * pairs. Returns one row per vertex that appears in any pair:
    * (id, comp) where `comp` is the smallest vertex id in the component.
    *
    * Converges in at most `maxIter` rounds or when a round changes no
    * label (the fixpoint — pointer jumping reaches it in O(log diameter)
    * rounds, so the default budget covers any component a real pair
    * table can hold; throws if the budget is exhausted first rather
    * than silently returning a half-merged clustering). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val e = pairs.select(col("id1").alias("src"), col("id2").alias("dst"))
    val edges = e
      .unionAll(e.select(col("dst").alias("src"), col("src").alias("dst")))
      .localCheckpoint(true) // reused every round: materialize once
    var labels = edges
      .select(col("src").alias("id"))
      .distinct()
      .select(col("id"), col("id").alias("comp"))
      .localCheckpoint(true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").alias("dst"), col("comp").alias("__nc")), Seq("dst"))
        .groupBy(col("src"))
        .agg(min(col("__nc")).alias("__nbr"))
      val stepped = labels
        .join(nbrMin.select(col("src").alias("id"), col("__nbr")), Seq("id"), "left")
        .select(
          col("id"),
          least(col("comp"), coalesce(col("__nbr"), col("comp"))).alias("__c1"),
          col("comp").alias("__old"))
        .localCheckpoint(true)
      // Pointer jump: adopt the current label of the current label. Label
      // values are vertex ids and labels only decrease, so the lookup hits
      // a row and never raises a label — it short-circuits chains, giving
      // O(log diameter) total rounds instead of diameter.
      val next = stepped
        .join(
          stepped.select(col("id").alias("__c1"), col("__c1").alias("__c2")),
          Seq("__c1"), "left")
        .select(
          col("id"),
          least(col("__c1"), coalesce(col("__c2"), col("__c1"))).alias("comp"),
          col("__old"))
        .localCheckpoint(true)
      changed = next.filter(col("comp") < col("__old")).count()
      labels = next.select(col("id"), col("comp"))
      round += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Per-vertex cluster assignment with keeper flag: (id, cluster_id,
    * is_keeper). Keeper = the smallest id of the cluster (deterministic,
    * engine-independent). */
  def clusterAssignments(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .select(
        col("id"),
        col("comp").alias("cluster_id"),
        (col("id") === col("comp")).alias("is_keeper"))

  /** Corpus dedup by cluster: drop every non-keeper member of each
    * cluster from `df`. One left-anti join against the (tiny) non-keeper
    * id set — the only time the full corpus is touched. Rows that appear
    * in no pair are untouched. */
  def dropNonKeepers(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val nonKeepers = connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").alias(idCol))
    df.join(nonKeepers, Seq(idCol), "left_anti")
  }
}
