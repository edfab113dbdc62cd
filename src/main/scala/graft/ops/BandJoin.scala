package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band / interval theta join: match left rows to right rows with equal
  * keys whose timestamps differ by less than a tolerance (J4,
  * `create_views.sql:109-115`).
  *
  * Two physical strategies:
  *
  *  - [[naive]]: equi-join on the keys with the band as a residual filter.
  *    This is what Athena/Catalyst plan for the reference SQL. Fine when
  *    each key has few rows; at 100 TB a hot key (one location over years
  *    of observations) turns the residual filter into an O(n·m) per-key
  *    fan-out bomb.
  *
  *  - [[bucketed]] (default): quantize time into tolerance-sized buckets,
  *    explode ONE side into (bucket-1, bucket, bucket+1), and equi-join on
  *    (keys :+ bucket). Every true band match lands in one of the three
  *    neighbor buckets, so results are identical; the join becomes a pure
  *    hash equi-join whose per-task work is bounded by rows-per-
  *    (key × tolerance-window) instead of rows-per-key. The 3× explode is
  *    map-side (narrow) and AQE handles residual skew.
  *
  * Semantics are one-to-many exactly like the reference (every pair within
  * the band, not nearest-match as-of; SURVEY §7.4 item 1).
  *
  * Timestamps are passed as epoch columns (any unit) with the tolerance in
  * the same unit, so callers choose exact integer arithmetic (micros) over
  * floating seconds.
  */
object BandJoin {

  /** Faithful plan: equi-join + band residual (parity with the reference's
    * execution shape). */
  def naive(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftEpoch: Column,
      rightEpoch: Column,
      tolerance: Long): DataFrame = {
    val cond = keys
      .map(k => left(k) === right(k))
      .reduce(_ && _) && abs(leftEpoch - rightEpoch) < tolerance
    left.join(right, cond)
  }

  /** Scale plan: bucket-quantized equi-join. `leftEpochName` /
    * `rightEpochName` are epoch column names (same unit as `tolerance`,
    * distinct from each other) present on the inputs. The join keys and
    * the bucket are folded into a `USING`-style join, so shared key names
    * come out unambiguous (one copy, like the left side of [[naive]] with
    * the right key dropped). */
  def bucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftEpochName: String,
      rightEpochName: String,
      tolerance: Long): DataFrame = {
    // floor-division bucket (test data is all post-epoch; see Tables note)
    val l = left.withColumn("__bucket", expr(s"$leftEpochName DIV $tolerance"))
    val r = right
      .withColumn("__b0", expr(s"$rightEpochName DIV $tolerance"))
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket", col("__b0") + col("__off"))
      .drop("__b0", "__off")

    l.join(r, (keys :+ "__bucket").toSeq)
      .filter(abs(col(leftEpochName) - col(rightEpochName)) < tolerance)
      .drop("__bucket")
  }

  /** Skew-armored [[bucketed]]: a single hot (key × tolerance-window)
    * pair — one location logging millions of observations in one hour at
    * 100 TB — concentrates one hash partition under the plain bucketed
    * join. Salting spreads it: the LEFT (probe/large) side gets a
    * deterministic salt in [0, saltBuckets) hashed from `leftSaltCols`
    * (a unique-ish row id — NOT the join key, which would re-collapse the
    * hot key into one bucket), and the RIGHT side is replicated across
    * ALL salts, so every true pair still meets in exactly one
    * (key, bucket, salt) partition. Results are identical to [[bucketed]]
    * (the `sk_salted_band_join` entry shares j4's faithful theta-join
    * oracle); cost is a saltBuckets× map-side replication of the right
    * side — pick the SMALLER input as `right`, same as a build side.
    *
    * This is the manual fallback for the case AQE skew-join splitting
    * (`spark.sql.adaptive.skewJoin.enabled`, on by default) already
    * covers for sort-merge joins at runtime: use it when the plan is a
    * shuffled hash join, when one (key, bucket) exceeds even a split
    * partition, or when deterministic task sizing matters more than
    * adaptive splitting. */
  def saltedBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftEpochName: String,
      rightEpochName: String,
      tolerance: Long,
      leftSaltCols: Seq[String],
      saltBuckets: Int = 8): DataFrame = {
    val l = left
      .withColumn("__bucket", expr(s"$leftEpochName DIV $tolerance"))
      .withColumn("__salt", Skew.salt(saltBuckets, leftSaltCols.map(col): _*))
    val r = right
      .withColumn("__b0", expr(s"$rightEpochName DIV $tolerance"))
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket", col("__b0") + col("__off"))
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .drop("__b0", "__off")
    l.join(r, (keys :+ "__bucket" :+ "__salt").toSeq)
      .filter(abs(col(leftEpochName) - col(rightEpochName)) < tolerance)
      .drop("__bucket", "__salt")
  }

  /** As-of (nearest-match) variant: each left row keeps only its CLOSEST
    * in-band right row (ties broken by earlier right epoch). The opt-in
    * improvement over the reference's one-to-many semantics
    * (SURVEY §7.4 item 1) — accuracy rows stop multiplying when several
    * observations fall inside the tolerance.
    *
    * `leftRowKeys` must uniquely identify left rows (the window that
    * picks the nearest partitions by them — bounded per-row work, no
    * global sort). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftEpochName: String,
      rightEpochName: String,
      tolerance: Long,
      leftRowKeys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bucketed(left, right, keys, leftEpochName, rightEpochName, tolerance)
      .withColumn(
        "__rank",
        row_number().over(
          Window
            .partitionBy(leftRowKeys.map(col): _*)
            .orderBy(abs(col(leftEpochName) - col(rightEpochName)), col(rightEpochName))))
      .filter(col("__rank") === 1)
      .drop("__rank")
  }
}
