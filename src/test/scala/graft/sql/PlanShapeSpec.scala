package graft.sql

import graft.{SparkEntry, SparkSuite}

/** Physical-plan regression guards: the properties SCALE.md claims are
  * asserted here, so a refactor that silently degrades a plan (loses a
  * broadcast, reintroduces a cartesian product, drops pushdown) fails
  * the build rather than the next 100 TB run.
  */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  test("dim joins broadcast (j5, j2)") {
    assert(plan("j5_fact_dim").contains("BroadcastHashJoin"))
    assert(plan("j2_date_cast_join").contains("BroadcastHashJoin"))
  }

  test("no cartesian products or broadcast nested loops anywhere in the declared corpus") {
    // ann/ivf use broadcast nested loop by design (bounded query/centroid side)
    val exempt = Set("ann_brute_topk", "ann_ivf_topk")
    SparkEntry.queries.keys.filterNot(exempt).foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }

  test("band join (j4) is a hash equi-join on (key, bucket), not a theta join") {
    val p = plan("j4_band_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("scans push filters and prune columns (s2)") {
    val p = plan("s2_scan")
    assert(p.contains("PushedFilters: [IsNotNull(n_regionkey), LessThan(n_regionkey,3)]"), p.take(2000))
  }

  test("aggregates are partial+final (a1: two HashAggregate levels)") {
    val p = plan("a1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("contamination joins the benchmark shingle set broadcast (no corpus shuffle)") {
    val p = plan("ct_ngram_overlap")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("stratified sampling is a narrow filter — no hash shuffle before the ordering") {
    val p = plan("sm_stratified")
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("LSH bucket cap reuses the bucket shuffle: window + groupBy share ONE exchange") {
    val p = plan("dd_minhash_lsh")
    assert("Exchange hashpartitioning\\(__band".r.findAllIn(p).size === 1, p.take(3000))
  }

  test("vector LSH cap shares the bucket shuffle: ONE band-hash exchange (cos_near_dup)") {
    // the windowed occupancy count and the collect_list groupBy both
    // hash-partition on (band, bh) — EnsureRequirements must plan exactly
    // one exchange on that key (the verification joins key on id1/id2,
    // not band)
    val p = plan("cos_near_dup")
    assert("Exchange hashpartitioning\\(band".r.findAllIn(p).size === 1, p.take(3000))
  }

  test("bucketed join + aggregate plans zero hash exchanges") {
    val p = plan("bk_bucketed_join")
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
  }

  test("salted aggregation runs two hash-aggregate stages, no extra exchange beyond the two keys") {
    val p = plan("sk_salted_agg")
    // (key, salt) partials + key merge: exactly two shuffles, both
    // aggregate-output-sized
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p.take(3000))
  }

  test("batch sessionization is the relational window plan — no typed group materialization") {
    // streaming keeps flatMapGroupsWithState; batch must NOT buffer one
    // (user × batch) group per task heap — a hot user with 10⁸ events
    // would OOM. The gaps-and-islands window plan sorts inside spill-able
    // partitions instead.
    val p = plan("c6_sessionize")
    assert(!p.contains("FlatMapGroupsWithState"), p.take(3000))
    assert(!p.contains("DeserializeToObject"), p.take(3000))
    assert(p.contains("Window"), p.take(3000))
  }

  test("default fact views plan no unpartitioned window (scalable surrogate keys)") {
    graft.fixtures.WeatherDemo.ensurePipeline(spark)
    val p = spark.table("fact_forecast_accuracy").queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(3000))
  }
}
