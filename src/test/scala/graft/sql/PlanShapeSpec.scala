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

  test("multi-probe LSH candidate join broadcasts the probe side (corpus keys never hash-shuffle into it)") {
    // probes are |Q|·bands·(rows+1) rows — the candidate join must be a
    // BroadcastHashJoin on (band, bh); the corpus side's only exchange is
    // the occupancy-cap window, same as the single-probe paths
    val p = plan("ann_mplsh_topk")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert("Exchange hashpartitioning\\(band".r.findAllIn(p).size === 1, p.take(3000))
  }

  test("Q10 shape (x3): broadcast dim + per-partition heap top-20, no global sort") {
    val p = plan("x3_returned_customers")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("incremental dedup broadcasts the batch keys against the history index") {
    val p = plan("dd_incremental")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("mixture's only window runs on the boundary bucket (partition spec includes the bucket), never a stratum-wide rank") {
    val p = plan("sm_mixture")
    assert("Window \\[[^\\]]*row_number[^\\]]*\\], \\[stratum[^,]*, __b".r.findFirstIn(p).isDefined,
      p.take(3000))
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

  test("global top-k plans TakeOrderedAndProject — per-partition heaps, no full sort") {
    val p = plan("o3_top_limit")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("Exchange rangepartitioning"), p.take(2000))
  }

  test("keyset pagination (o5) seeks with a filter + top-k — no global sort, no discarded prefix") {
    val p = plan("o5_keyset")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("Exchange rangepartitioning"), p.take(3000))
    // the page is a FILTERED top-k: the seek predicate exists in the
    // plan (OFFSET would instead discard rows inside the limit operator)
    assert(!p.toLowerCase.contains("offset"), p.take(3000))
  }

  test("Q2 shape (x19): correlated scalar-min decorrelates to an aggregate + join, dims broadcast") {
    val p = plan("x19_min_cost_supplier")
    // decorrelation proof: no subquery node survives — the per-part min
    // is a HashAggregate joined back on (min_price_c, partkey)
    assert(!p.contains("Subquery"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("Q4 shape (x20): EXISTS plans as a left-semi join, never a per-row probe") {
    val p = plan("x20_priority_exists")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(!p.contains("Subquery"), p.take(3000))
  }

  test("Q17 shape (x23): correlated scalar-avg decorrelates to a per-part aggregate + join") {
    val p = plan("x23_small_qty_revenue")
    assert(!p.contains("Subquery"), p.take(3000))
    assert(p.contains("HashAggregate"), p.take(3000))
  }

  test("Q20 shape (x24): nested IN + correlated HAVING all decorrelate to semi joins") {
    val p = plan("x24_excess_suppliers")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(!p.contains("Subquery"), p.take(3000))
  }

  test("pivot with explicit values is one aggregation pass — no distinct-collect pre-job") {
    // without the explicit value list Spark runs a separate job to
    // collect distinct pivot keys — a wasted full scan at 100 TB. The
    // pivot values appearing as pivotfirst LITERALS proves they were
    // resolved at plan time, not collected. Two exchanges are inherent
    // ((flag,status) inner agg partials, then flag pivot) and both carry
    // aggregate-sized data, never the raw fact.
    val p = plan("a11_pivot")
    assert(p.contains("pivotfirst") && p.contains(", F, O,"), p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p.take(2000))
  }

  test("grouping sets expand map-side and aggregate through ONE exchange") {
    // each input row fans out to its matching sets BEFORE the shuffle, so
    // the fact is read once and shuffled once for all three sets
    val p = plan("a12_grouping_sets")
    assert(p.contains("Expand"), p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("time-range rolling window stays partitioned by user — no single-partition sort") {
    val p = plan("w7_range_frame")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("Exchange SinglePartition"), p.take(2000))
  }

  test("AQE splits a planted hot key in a shuffled join (skew-join evidence)") {
    // the adaptive counterpart to BandJoin.saltedBucketed: when the plan
    // IS a sort-merge join, AQE re-plans oversized partitions at runtime.
    // Thresholds are lowered so a test-sized fixture trips the same code
    // path a 100 TB hot key would.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 190k of 200k left rows share key 0 — one partition ≫ the rest
      val hotL = spark.range(200000)
        .select(when(col("id") < 190000, 0L).otherwise(col("id")).alias("k"), col("id").alias("v"))
      val right = spark.range(500).select(col("id").alias("k"), col("id").alias("w"))
      val joined = hotL.join(right, Seq("k"))
      // collect() executes THIS QueryExecution (count()/foreach() build a
      // new one via agg/rdd and leave joined's adaptive plan un-finalized)
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") || p.contains("skewed"), p.take(4000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("runtime bloom filter from a selective dim filter prunes the fact side of a shuffled join") {
    // when the dim side is too big to broadcast but carries a selective
    // filter, Spark builds a bloom filter over its join keys at runtime
    // and pushes might_contain() into the fact scan — at 100 TB this
    // drops most fact rows BEFORE the shuffle. Thresholds lowered so the
    // test fixture takes the same code path.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.functions.col
      val fact = graft.sources.Tables.lineitem(spark, sf())
      val dim = graft.sources.Tables.orders(spark, sf())
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), p.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    // fact partitioned on the join key column; the dim filter's matching
    // keys become a runtime PartitionFilter on the fact scan — only the
    // surviving partition directories are listed/read. The catalog-level
    // counterpart of the bloom filter above, and the property that keeps
    // a date-partitioned 100 TB fact scan proportional to the dim filter.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-dpp")
    graft.sources.Tables.lineitem(spark, sf())
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(s"$root/fact")
    // dim must come from storage with the filter on a NON-join column:
    // a literal dim would constant-fold into a static partition filter
    // (also fine, but then nothing is pruned at RUNTIME)
    Seq(("A", "returned"), ("N", "kept"), ("R", "kept"))
      .toDF("flag", "grp").write.mode("overwrite").parquet(s"$root/dim")
    val fact = spark.read.parquet(s"$root/fact")
    val dim = spark.read.parquet(s"$root/dim").filter(col("grp") === "returned")
    val joined = fact.join(dim, col("l_returnflag") === col("flag"))
      .groupBy(col("flag")).agg(count(lit(1)).alias("n"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"), p.take(3000))
  }

  test("a self-joined aggregate reuses one exchange — the shared subtree is scanned once") {
    // the "compare each group to itself" shape (period-over-period,
    // cohort vs cohort): both join inputs are the SAME aggregate, and
    // ReuseExchange must plan one scan+shuffle with a ReusedExchange
    // node, not recompute the 100 TB subtree twice
    import org.apache.spark.sql.functions._
    val agg = graft.sources.Tables.orders(spark, sf())
      .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).alias("spend"))
    val joined = agg.alias("a")
      .join(agg.alias("b"), col("a.o_custkey") === col("b.o_custkey"))
      .select(col("a.o_custkey"), (col("a.spend") + col("b.spend")).alias("s2"))
    joined.collect() // finalize the adaptive plan
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("TableCacheQueryStage")
      || "Exchange hashpartitioning\\(o_custkey".r.findAllIn(p).size === 1, p.take(3000))
  }

  test("optimizer rule rewrites the portable regex token count into the native kernel") {
    // a user writing the reference form gets the single-scan TokenCount
    // transparently (injectOptimizerRule), results unchanged
    import org.apache.spark.sql.functions._
    graft.sources.Tables.documents(spark, sf()).createOrReplaceTempView("graft_nrr_docs")
    val sql = """SELECT doc_id,
                        size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS n
                 FROM graft_nrr_docs"""
    val df = spark.sql(sql)
    assert(df.queryExecution.optimizedPlan.toString.contains("token_count"),
      df.queryExecution.optimizedPlan.toString.take(2000))
    // and the rewrite is invisible to results: matches the native API
    val viaNative = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id"), graft.functions.native.tokenCount(col("text")).alias("n"))
    assert(df.orderBy(col("doc_id")).collect().toSeq ===
      viaNative.orderBy(col("doc_id")).collect().toSeq)
  }

  test("ANALYZE TABLE statistics feed the cost-based optimizer (rowCount estimates present)") {
    // at 100 TB the CBO's join-order and broadcast decisions are only as
    // good as catalog statistics — this pins the ANALYZE → stats →
    // estimated-rowCount pipeline end to end
    import org.apache.spark.sql.functions._
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cbo")
    graft.sources.Tables.orders(spark, sf())
      .write.mode("overwrite").saveAsTable("graft_cbo.orders_s")
    spark.sql("ANALYZE TABLE graft_cbo.orders_s COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val plan = spark.table("graft_cbo.orders_s")
        .filter(col("o_orderpriority") === "1-URGENT")
        .queryExecution.optimizedPlan
      assert(plan.stats.rowCount.isDefined, plan.stats.toString)
      // the filter estimate must be a strict subset of the table estimate
      val tableRows = spark.table("graft_cbo.orders_s").queryExecution.optimizedPlan.stats.rowCount.get
      assert(plan.stats.rowCount.get < tableRows)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
      spark.sql("DROP TABLE IF EXISTS graft_cbo.orders_s")
      spark.sql("DROP DATABASE IF EXISTS graft_cbo")
    }
  }

  test("range-sorted layout prunes parquet row groups: a tight range reads a fraction of the rows") {
    // writeRangeSorted clusters the sort key into contiguous row groups;
    // the scan's pushed range predicate then skips whole groups via
    // min/max stats — observable as the scan OUTPUTTING far fewer rows
    // than the file holds (row-group granularity, before the Filter)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-sorted")
    val li = graft.sources.Tables.lineitem(spark, sf("sf0.01"))
    val total = li.count()
    graft.ops.Bucketing.writeRangeSorted(
      li, s"$root/li", "l_orderkey", partitions = 4, blockBytes = 256L * 1024)
    val filtered = spark.read.parquet(s"$root/li")
      .filter(col("l_orderkey").between(lit(100L), lit(500L)))
    filtered.collect()
    val scan = filtered.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(l_orderkey"),
      scan.metadata("PushedFilters"))
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned < total / 2, s"scan output $scanned of $total rows — row groups not pruned")
  }

  test("Z-ordered layout prunes row groups on EITHER clustered dimension") {
    // interleaved (partkey, suppkey) clustering: a tight range on either
    // column alone must skip most row groups — the property a
    // single-column sort gives only its own column
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-zorder")
    val li = graft.sources.Tables.lineitem(spark, sf("sf0.01"))
    val total = li.count()
    graft.ops.Bucketing.writeZOrdered(
      li, s"$root/li", "l_partkey", 1999L, "l_suppkey", 99L,
      bits = 11, partitions = 4, blockBytes = 128L * 1024)
    def scannedRows(pred: org.apache.spark.sql.Column): Long = {
      val f = spark.read.parquet(s"$root/li").filter(pred)
      f.collect()
      f.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: FileSourceScanExec => s
      }.get.metrics("numOutputRows").value
    }
    val byPart = scannedRows(col("l_partkey").between(100L, 180L))
    val bySupp = scannedRows(col("l_suppkey").between(10L, 14L))
    assert(byPart < total / 2, s"partkey range scanned $byPart of $total")
    assert(bySupp < total / 2, s"suppkey range scanned $bySupp of $total")
  }

  test("default fact views plan no unpartitioned window (scalable surrogate keys)") {
    graft.fixtures.WeatherDemo.ensurePipeline(spark)
    val p = spark.table("fact_forecast_accuracy").queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(3000))
  }

  test("correlated scalar subquery (x4) decorrelates to one aggregate + join, no per-row subquery") {
    val p = plan("x4_correlated_scalar")
    assert(!p.contains("Subquery"), s"per-row subquery survived optimization:\n${p.take(2000)}")
    assert(p.contains("HashAggregate") &&
      (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin")),
      p.take(2000))
  }

  test("lateral correlated aggregate (x5) decorrelates to an outer equi join") {
    val p = plan("x5_lateral")
    assert(!p.contains("Subquery"), s"per-row lateral survived optimization:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("IN-subquery with HAVING (x6) rewrites to a left semi join against the aggregate") {
    val p = plan("x6_large_orders")
    assert(!p.contains("Subquery"), s"per-row IN subquery survived:\n${p.take(2000)}")
    assert(p.contains("LeftSemi"), s"expected a left semi join:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 should be a heap:\n${p.take(2000)}")
  }

  test("dq report (c11) evaluates all row-level constraints in one scan of the fact table") {
    val p = SparkEntry.queries("c11_dq_report")(spark, sf())
      .queryExecution.executedPlan.toString
    // one scan for the four sum(CASE) constraints + one for uniqueness +
    // two for referential integrity (child + parent) = 4 lineitem scans
    // would mean per-constraint passes; the shared aggregate keeps it to 3
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 4, s"expected <=4 parquet scans (shared row-level aggregate), got $scans:\n${p.take(3000)}")
  }

  test("explicit bloom semi join probes at the fact scan, before any exchange (bf_bloom_semi)") {
    val p = plan("bf_bloom_semi")
    // the codegen'd might_contain predicate sits in the fact-side Filter
    assert(p.contains("might_contain"), p.take(3000))
    // and the pre-filtered semi join never degenerates to a nested loop
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(3000))
    // positional pin: in the printed tree the probe Filter must sit
    // DIRECTLY over the fact FileScan with no Exchange between them —
    // i.e. rows are dropped before they ever reach a shuffle
    val probeAt = p.indexOf("might_contain")
    val scanAfterProbe = p.indexOf("FileScan", probeAt)
    assert(scanAfterProbe > probeAt, "fact scan below the probe")
    val between = p.substring(probeAt, scanAfterProbe)
    assert(!between.contains("Exchange"),
      s"an Exchange sits between the bloom probe and the fact scan:\n$between")
  }

  test("NOT IN over a nullable subquery plans the null-aware anti join (j10)") {
    val p = plan("j10_notin_naaj")
    // BroadcastHashJoin ... LeftAnti, BuildRight, true — the trailing
    // flag is isNullAwareAntiJoin: the three-valued NOT IN contract kept
    // inside a HASH join instead of the O(n·m) nested-loop fallback
    assert(p.contains("LeftAnti, BuildRight, true"), p.take(3000))
  }

  test("deterministic split is a narrow projection — no shuffle before the ordering (sm_split)") {
    val p = plan("sm_split")
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("Q21 shape (x10): correlated EXISTS/NOT EXISTS decorrelate to semi/anti, heap top-20") {
    val p = plan("x10_waiting_suppliers")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a left semi join:\n${p.take(3000)}")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as a left anti join:\n${p.take(3000)}")
    assert(!p.contains("Subquery"), s"a correlated subquery survived optimization:\n${p.take(3000)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), s"top-20 should be a heap, not a sort:\n${p.take(3000)}")
  }

  test("Q7/Q8 shapes (x11, x12): dims broadcast, lineitem never cartesian, single agg each") {
    val p11 = plan("x11_volume_shipping")
    assert(p11.contains("BroadcastHashJoin"), s"nation/supplier dims must broadcast:\n${p11.take(3000)}")
    assert(!p11.contains("BroadcastNestedLoopJoin") && !p11.contains("CartesianProduct"), p11.take(3000))
    val p12 = plan("x12_market_share")
    assert(p12.contains("BroadcastHashJoin"), s"snowflake dims must broadcast:\n${p12.take(3000)}")
    assert(!p12.contains("BroadcastNestedLoopJoin") && !p12.contains("CartesianProduct"), p12.take(3000))
  }

  test("null-safe join stays a hash join; EXISTS/NOT EXISTS rewrite to semi/anti (j11, x7, x8)") {
    val pj = plan("j11_nullsafe_join")
    assert(pj.contains("HashJoin") && !pj.contains("BroadcastNestedLoopJoin"), pj.take(2000))
    val p7 = plan("x7_exists")
    assert(p7.contains("LeftSemi") && !p7.contains("Subquery"), p7.take(2000))
    val p8 = plan("x8_not_exists")
    assert(p8.contains("LeftAnti") && !p8.contains("Subquery"), p8.take(2000))
  }

  test("equifreq binning never sorts the facts; Q16 shape is anti join + heap limit (a22, x9)") {
    val pa = plan("a22_equifreq_bins")
    // boundaries come from an aggregate, never ntile over a global sort
    assert(!pa.contains("Window"), pa.take(2000))
    assert("FileScan parquet".r.findAllIn(pa).size <= 2, pa.take(2000))
    val px = plan("x9_parts_supplier")
    assert(px.contains("LeftAnti"), px.take(2000))
    assert(px.contains("TakeOrderedAndProject"), px.take(2000))
  }

  test("corpus shard-shuffle: one shard exchange, every window partitioned (cp_shard)") {
    val p = plan("cp_shard")
    // the rank window must be partitioned by shard — an unpartitioned
    // window here would serialize the whole corpus through one task
    assert(p.contains("windowspecdefinition(shard"), p.take(3000))
  }

  test("vocabulary truncation is a heap TakeOrdered — the corpus is never globally sorted (tx_vocab)") {
    val p = plan("tx_vocab")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("source divergence scans the corpus ONCE — a linear pipeline, no self-join re-expansion") {
    val p = plan("tx_divergence")
    // one FileScan: the algebraic form needs no tf-vs-totals self-join,
    // which is what re-expands into repeated corpus scans in the naive
    // plan. One corpus-sized exchange (source, term), then vocab-sized.
    assert("FileScan parquet".r.findAllIn(p).size === 1, p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("Q6 shape (x13): join-free single scan with every predicate pushed") {
    // the default 100-char metadata render truncates the PushedFilters
    // list before the quantity/discount entries — widen it for this pin
    spark.conf.set("spark.sql.maxMetadataStringLength", 2000)
    try {
      val p = plan("x13_forecast_revenue")
      assert(!p.contains("Join"), p.take(3000))
      assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(3000))
      assert(p.contains("LessThan(l_quantity,24.0)"), p.take(3000))
      assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"), p.take(3000))
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", 100)
  }

  test("Q9 shape (x16): all four dims broadcast — lineitem never sort-merges") {
    val p = plan("x16_profit")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 4, p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("Q13 shape (x17): the outer join survives — zero-order customers are the point") {
    val p = plan("x17_order_histogram")
    assert(p.contains("LeftOuter"), p.take(3000))
  }

  test("Q19 shape (x18): ONE broadcast equi-join; disjunct bands pushed into both scans") {
    val p = plan("x18_disjunctive")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 1, p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the OR-of-bands reaches parquet on each side (quantity bands on
    // lineitem, brand/size bands on part)
    assert("PushedFilters: \\[[^\\]]*Or\\(".r.findAllIn(p).size >= 2, p.take(3000))
  }
}
