package graft.plans

import graft.SparkSuite
import graft.ops.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native grouped top-k operator: parity with the window form,
  * plan shape, determinism, and the partial-stage flush fallback. */
class TopKNativeSpec extends SparkSuite {

  import spark.implicits._

  private def orders = graft.sources.Tables.orders(spark, sf())
    .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))

  test("native top-k equals the window row_number filter, row for row") {
    val native = TopK.nativePerGroup(
      orders, Seq("o_orderstatus"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
    val window = orders
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rnk") <= 3).drop("rnk")
    assert(native.exceptAll(window).count() === 0 && window.exceptAll(native).count() === 0)
    assert(native.count() === window.count())
  }

  test("plan shape: partial + final native nodes, ONE exchange, no sort, no window") {
    val p = TopK.nativePerGroup(
      orders, Seq("o_orderstatus"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .queryExecution.executedPlan.toString
    // physical nodes print without the Exec suffix; partial prints `true`
    assert("TopKPerGroup".r.findAllIn(p).length >= 2, s"expected partial+final nodes:\n$p")
    assert(p.contains(", true") && p.contains(", false"), s"expected one partial and one final:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"expected exactly one exchange:\n$p")
    assert(!p.contains("SortExec") && !p.toLowerCase.contains("window"),
      s"native top-k must not sort or window:\n$p")
  }

  test("result is partitioning-invariant") {
    val base = spark.range(5000).select(
      (col("id") % 37).alias("g"), col("id"),
      pmod(col("id") * 131, lit(997)).alias("v"))
    val a = TopK.nativePerGroup(base, Seq("g"), Seq(("v", true), ("id", false)), k = 5)
    val b = TopK.nativePerGroup(
      base.repartition(17), Seq("g"), Seq(("v", true), ("id", false)), k = 5)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("ascending order and k=1 pick the minimum per group") {
    val df = Seq((1, 9), (1, 2), (1, 5), (2, 7), (2, 8)).toDF("g", "v")
    val out = TopK.nativePerGroup(df, Seq("g"), Seq(("v", false)), k = 1)
      .orderBy(col("g")).collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.toSeq === Seq((1, 2), (2, 7)))
  }

  test("group-cardinality explosion past the flush cap stays correct (partial flushes, no OOM path)") {
    val groups = TopKPerGroupExec.FlushGroups + 1000
    // two rows per group in ONE input partition so a single partial
    // instance must track > FlushGroups heaps and flush mid-stream
    val big = spark.range(groups.toLong * 2)
      .select((col("id") % groups).alias("g"), col("id").alias("v"))
      .coalesce(1)
    val out = TopK.nativePerGroup(big, Seq("g"), Seq(("v", true)), k = 1)
    assert(out.count() === groups.toLong)
    // top-1 by v desc is the id >= groups copy for every group
    assert(out.filter(col("v") < groups.toLong).count() === 0)
  }
}
