package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter runtime pruning — the scan-side semi-join reducer.
  *
  * The 100 TB problem this solves: a semi join `fact ⋉ dim` where `dim`
  * is too big (or too late-derived) to broadcast raw shuffles the ENTIRE
  * fact table just to discard most of it on the reduce side. A Bloom
  * filter of the dim keys is a few MB even at 10⁸ keys, so it broadcasts
  * no matter how wide `dim` is; applying `might_contain` at the fact
  * SCAN drops non-matching rows before they ever reach the exchange.
  * The exact join that follows only has to eliminate the Bloom's false
  * positives (~`fpp` of the surviving rows), so the shuffle moves
  * `|fact ⋉ dim| · (1 + fpp)` rows instead of `|fact|`.
  *
  * This is the manual, composable form of Spark's own
  * `InjectRuntimeFilter` rule (`spark.sql.optimizer.runtime.bloomFilter
  * .enabled`), which only fires on equi-joins it can see through; the
  * explicit op works on any derived key and any join shape, and the
  * build side is a deliberate driver-side action (exactly how Spark's
  * own runtime filters and DPP broadcast their build results).
  *
  * Both the aggregate ([[BloomFilterAggregate]]) and the probe
  * ([[BloomFilterMightContain]], codegen'd) are Catalyst natives — the
  * probe stays inside whole-stage codegen on the scan, keyed on
  * `xxhash64` exactly as `InjectRuntimeFilter` does.
  */
object RuntimeFilter {

  /** Distributed Bloom build: one partial+final aggregate over
    * `keys`, result collected to the driver as the serialized filter
    * (an action, like every runtime-filter build). `expectedItems`
    * sizes the filter; `numBits` caps memory (8 bits/key ≈ 2% FPP). */
  def buildBloom(df: DataFrame, key: String, expectedItems: Long, numBits: Long): Array[Byte] = {
    val hashed = XxHash64(Seq(Bridge.expression(df(key))), 42L)
    val agg = Bridge.column(
      new BloomFilterAggregate(hashed, Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())
    df.select(agg.alias("bf")).head.getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))` as a Column — a codegen'd
    * scan-side predicate; the serialized filter rides into the task as
    * a Literal. Fine for small filters; past ~100 KB prefer
    * [[mightContainBroadcast]] (a plan literal is re-serialized into
    * EVERY task binary — measured ~3 s/stage tax at 1 MB × 64 tasks). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(Bridge.expression(key)), 42L)))

  /** The broadcast form: bytes ship once per executor (torrent
    * broadcast), the task binary carries only the handle — how Spark's
    * own injected runtime filters travel. Codegen'd native expression
    * ([[graft.functions.BloomMightContainBroadcast]]). */
  def mightContainBroadcast(
      spark: org.apache.spark.sql.SparkSession,
      bloom: Array[Byte],
      key: Column): Column =
    Bridge.column(graft.functions.BloomMightContainBroadcast(
      spark.sparkContext.broadcast(bloom),
      XxHash64(Seq(Bridge.expression(key)), 42L)))

  /** Semi join `fact ⋉ dimKeys` with a Bloom pre-filter on the fact
    * scan. Exact: the trailing left-semi join removes the Bloom's false
    * positives, so the result is identical to a plain semi join — only
    * the shuffle volume changes.
    *
    * `dim` is evaluated TWICE — once aggregated into the Bloom (an
    * action) and once as the join's build side; actions cannot share a
    * subtree, so a dim derived from an expensive subquery MUST be
    * `.persist()`ed (or checkpointed) by the caller first, exactly as
    * one would before any multi-action reuse. The scale probe measured
    * the uncached form re-scanning a corpus-sized dim twice — the
    * slowdown was the double evaluation, never the probe itself
    * (~0.3 s per 4.8M rows, measured).
    *
    * When to reach for this op at all: the dim KEY SET is too large to
    * broadcast raw (AQE would otherwise turn the semi join into a
    * broadcast join and win) but its Bloom still fits comfortably —
    * ~1.2 MB per 10⁶ keys at 8 bits/key. Below that size, let AQE
    * broadcast; above it, the Bloom is the only thing that still ships
    * to every task. */
  def bloomSemiJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23,
      maxFpp: Double = 0.33): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    // adaptive guard: a filter overloaded past its design point (more
    // dim keys than expectedItems) converges on FPP ≈ 1 — probing with
    // it is pure overhead on every fact row (measured 8.8× super-linear
    // in the scale probe before this guard). Same reasoning as the
    // selectivity thresholds on Spark's InjectRuntimeFilter: when the
    // filter can't prune, don't ship it.
    // a null filter means the dim had ZERO rows (the aggregate returns
    // null on empty input) — the semi join is empty; short-circuit the
    // fact scan entirely rather than probing with a null literal
    if (bloom == null) return fact.limit(0)
    val fpp = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bloom)).expectedFpp()
    val pruned =
      if (fpp <= maxFpp)
        fact.where(mightContainBroadcast(fact.sparkSession, bloom, fact(factKey)))
      else fact
    // join on the dim side's RESOLVED attribute — a bare col(dimKey)
    // is ambiguous whenever dimKey also names a fact column (the
    // factKey == dimKey case, the most common semi-join shape)
    val keys = dim.select(col(dimKey)).distinct()
    pruned.join(keys, pruned(factKey) === keys(dimKey), "left_semi")
  }
}
