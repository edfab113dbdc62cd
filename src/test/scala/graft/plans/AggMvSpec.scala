package graft.plans

import graft.SparkSuite
import graft.sql.MaterializedAgg
import org.apache.spark.sql.functions._

/** Automatic materialized-view rewrite: plan re-targets onto the
  * summary table, results never change. */
class AggMvSpec extends SparkSuite {

  import spark.implicits._

  private def freshBase(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("aggmv").toString
    val base = s"$root/base"
    val mv = s"$root/mv"
    (1 to 5000).map { i =>
      (if (i % 3 == 0) "A" else if (i % 3 == 1) "B" else "C", 1990 + i % 8, i.toLong, i * 1.5)
    }.toDF("status", "yr", "cents", "score")
      .write.parquet(base)
    (base, mv)
  }


  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toUri.getPath)
    }.flatten

  override def afterAll(): Unit = {
    MaterializedAgg.clear()
    super.afterAll()
  }

  test("aggregate over the base rewrites onto the MV: plan scans summary, results identical") {
    val (base, mv) = freshBase()
    MaterializedAgg.create(spark, base, mv, Seq("status", "yr"), Seq("cents", "score"))

    def q = spark.read.parquet(base)
      .groupBy("status")
      .agg(
        count(lit(1)).alias("n_rows"),
        sum(col("cents")).alias("sum_cents"),
        min(col("cents")).alias("min_cents"),
        max(col("cents")).alias("max_cents"),
        avg(col("score")).alias("avg_score"))

    val paths = scanPaths(q)
    assert(paths.nonEmpty && paths.forall(_ == mv), s"plan must scan only the MV, got $paths")

    // ground truth computed with the registry EMPTY (no rewrite)
    MaterializedAgg.clear()
    val expected = q.orderBy("status").collect().toSeq
    MaterializedAgg.create(spark, base, mv, Seq("status", "yr"), Seq("cents", "score"))
    assert(q.orderBy("status").collect().toSeq === expected)
  }

  test("subset grouping + group-column filter rewrite; re-aggregation is exact") {
    val (base, mv) = freshBase()
    MaterializedAgg.create(spark, base, mv, Seq("status", "yr"), Seq("cents"))
    def q = spark.read.parquet(base)
      .filter(col("yr") >= 1994)
      .groupBy("yr")
      .agg(count(lit(1)).alias("n"), sum("cents").alias("s"))
    assert(scanPaths(q).forall(_ == mv))
    MaterializedAgg.clear()
    val expected = q.orderBy("yr").collect().toSeq
    MaterializedAgg.create(spark, base, mv, Seq("status", "yr"), Seq("cents"))
    assert(q.orderBy("yr").collect().toSeq === expected)
  }

  test("SQL text queries rewrite too — the surface doesn't matter") {
    val (base, mv) = freshBase()
    MaterializedAgg.create(spark, base, mv, Seq("status", "yr"), Seq("cents"))
    spark.read.parquet(base).createOrReplaceTempView("aggmv_base")
    val q = spark.sql(
      "SELECT status, count(*) AS n, sum(cents) AS s FROM aggmv_base GROUP BY status")
    assert(scanPaths(q).forall(_ == mv))
    val got = q.orderBy("status").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // hand-check one group: status A = i % 3 == 0 → 1666 rows
    assert(got.find(_._1 == "A").get._2 === 1666L)
  }

  test("registry save/load round-trips: a fresh registry restores MVs and the rewrite fires") {
    val (base, mv) = freshBase()
    val reg = s"${new java.io.File(base).getParent}/registry.mv"
    MaterializedAgg.clear() // isolate from earlier tests' registrations
    MaterializedAgg.create(spark, base, mv, Seq("status", "yr"), Seq("cents"))
    MaterializedAgg.save(spark, reg)
    MaterializedAgg.clear()
    def q = spark.read.parquet(base).groupBy("status").agg(sum("cents").alias("s"))
    assert(!scanPaths(q).contains(mv), "cleared registry must not rewrite")
    assert(MaterializedAgg.load(spark, reg) === 1)
    assert(scanPaths(q).forall(_ == mv), "restored registry must rewrite again")
    // loading a missing file is a no-op, not an error
    assert(MaterializedAgg.load(spark, s"$reg.absent") === 0)
  }

  test("unsupported shapes leave the plan untouched: distinct agg, measure filter, unknown column") {
    val (base, mv) = freshBase()
    MaterializedAgg.create(spark, base, mv, Seq("status", "yr"), Seq("cents"))
    val distinctQ = spark.read.parquet(base)
      .groupBy("status").agg(countDistinct(col("cents")).alias("d"))
    assert(!scanPaths(distinctQ).contains(mv))
    val measureFilterQ = spark.read.parquet(base)
      .filter(col("cents") > 100).groupBy("status").agg(sum("cents").alias("s"))
    assert(!scanPaths(measureFilterQ).contains(mv))
    val unknownColQ = spark.read.parquet(base)
      .groupBy("status").agg(sum("score").alias("s")) // score not a registered measure
    assert(!scanPaths(unknownColQ).contains(mv))
    // and they all still run correctly against the base
    assert(distinctQ.count() === 3 && measureFilterQ.count() === 3 && unknownColQ.count() === 3)
  }
}
