package graft.ops

import graft.SparkSuite
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning ([[graft.ops.RuntimeFilter]]): the
  * exactness contract (Bloom + exact cleanup ≡ plain semi join), the
  * pruning effect (the scan-side filter actually removes rows), and the
  * NOT IN three-valued-logic contract behind `j10_notin_naaj`.
  */
class RuntimeFilterSpec extends SparkSuite {

  test("bloomSemiJoin ≡ plain left-semi join, row for row") {
    val fact = Tables.orders(spark, sf())
    val dim = Tables.customer(spark, sf())
      .filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    val got = RuntimeFilter.bloomSemiJoin(fact, "o_custkey", dim, "c_custkey",
      expectedItems = 1L << 12, numBits = 1L << 16)
      .select(col("o_orderkey")).orderBy(col("o_orderkey")).collect().map(_.getLong(0))
    val want = fact.join(dim, fact("o_custkey") === dim("c_custkey"), "left_semi")
      .select(col("o_orderkey")).orderBy(col("o_orderkey")).collect().map(_.getLong(0))
    assert(got.sameElements(want))
    assert(got.nonEmpty)
  }

  test("the Bloom probe prunes the fact scan (survivors ≪ fact, ⊇ true matches)") {
    val fact = Tables.orders(spark, sf())
    val dim = Tables.customer(spark, sf())
      .filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    val bloom = RuntimeFilter.buildBloom(dim, "c_custkey", 1L << 12, 1L << 16)
    val factN = fact.count()
    val survivors = fact.where(RuntimeFilter.mightContain(bloom, col("o_custkey"))).count()
    val trueN = fact.join(dim, fact("o_custkey") === dim("c_custkey"), "left_semi").count()
    assert(survivors >= trueN, "might_contain has no false negatives")
    assert(survivors < factN / 2, s"bloom pruned ($survivors of $factN)")
  }

  test("an overloaded bloom (FPP≈1) is dropped — plan has no probe, result still exact") {
    val fact = Tables.orders(spark, sf())
    val dim = Tables.customer(spark, sf()).select(col("c_custkey"))
    // 16-bit filter for hundreds of keys: expectedFpp ≈ 1 ⇒ guard trips
    val df = RuntimeFilter.bloomSemiJoin(fact, "o_custkey", dim, "c_custkey",
      expectedItems = 4, numBits = 16)
    assert(!df.queryExecution.executedPlan.toString.contains("might_contain"),
      "overloaded filter must not be probed")
    assert(df.count() ===
      fact.join(dim, fact("o_custkey") === col("c_custkey"), "left_semi").count())
  }

  test("bloomSemiJoin resolves when both sides use the SAME key name") {
    import spark.implicits._
    val fact = Seq(1L, 2L, 3L, 4L).toDF("id")
    val dim = Seq(2L, 4L, 9L).toDF("id")
    val got = RuntimeFilter.bloomSemiJoin(fact, "id", dim, "id",
      expectedItems = 16, numBits = 1L << 10)
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(2L, 4L)))
  }

  test("bloomSemiJoin against an empty dim is empty (empty filter matches nothing)") {
    val fact = Tables.orders(spark, sf())
    val dim = Tables.customer(spark, sf())
      .filter(col("c_acctbal") > 1e18).select(col("c_custkey"))
    assert(RuntimeFilter.bloomSemiJoin(fact, "o_custkey", dim, "c_custkey",
      expectedItems = 16, numBits = 1L << 10).count() === 0L)
  }

  test("NOT IN over a subquery containing NULL is empty (three-valued logic)") {
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("rf_left")
    Seq(Some(9L), None).toDF("v").createOrReplaceTempView("rf_right_null")
    Seq(Some(9L), Some(2L)).toDF("v").createOrReplaceTempView("rf_right_nonull")
    // any NULL in the subquery ⇒ k <> NULL is UNKNOWN ⇒ no row qualifies
    assert(spark.sql(
      "SELECT k FROM rf_left WHERE k NOT IN (SELECT v FROM rf_right_null)").count() === 0L)
    // without NULLs it is the plain anti join
    assert(spark.sql(
      "SELECT k FROM rf_left WHERE k NOT IN (SELECT v FROM rf_right_nonull)")
      .collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 3L)))
  }
}
