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
    * a Literal (broadcast with the task binary). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(Bridge.expression(key)), 42L)))

  /** Semi join `fact ⋉ dimKeys` with a Bloom pre-filter on the fact
    * scan. Exact: the trailing left-semi join removes the Bloom's false
    * positives, so the result is identical to a plain semi join — only
    * the shuffle volume changes. `dim` should already be projected to
    * its key column (plus any filter); it is aggregated once for the
    * Bloom and reused (cached by the caller if it is expensive).
    */
  def bloomSemiJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    fact
      .where(mightContain(bloom, fact(factKey)))
      .join(dim.select(col(dimKey)).distinct(), fact(factKey) === col(dimKey), "left_semi")
  }
}
