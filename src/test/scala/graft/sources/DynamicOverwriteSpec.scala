package graft.sources

import graft.SparkSuite
import graft.store.{PartitionSpec, SnapshotStore}
import org.apache.spark.sql.functions._

/** Partition-scoped dynamic `INSERT OVERWRITE`
  * ([[graft.store.SnapshotStore.dynamicOverwriteCommit]]): with the
  * session's `partitionOverwriteMode=dynamic`, restating a slice of a
  * transform-partitioned snapshot table replaces exactly the touched
  * partitions — untouched partitions keep their FILES (not just their
  * rows), because the commit is manifest algebra, not a rewrite. */
class DynamicOverwriteSpec extends SparkSuite {

  private def freshCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("dynwh").toString
    val cat = "gdyn_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("restating one month replaces only that partition; untouched files survive byte-identical") {
    val (cat, wh) = freshCat()
    val t = s"$wh/facts/orders"
    val orders = Tables.orders(spark, sf())
    SnapshotStore.partitionedCommit(orders, t,
      Seq(PartitionSpec.PartField("months", "o_orderdate")))
    val m0 = SnapshotStore.manifest(spark, t, 0L)
    def monthOf(f: String): Option[String] =
      f.split('/').find(_.startsWith("__gp0=")).map(_.stripPrefix("__gp0="))
    val untouched0 = m0.files.filter(f => !monthOf(f).contains("1997-01")).toSet
    assert(untouched0.nonEmpty && untouched0.size < m0.files.size,
      "fixture must hold both touched and untouched partitions")

    // restate 1997-01: same keys, totalprice doubled
    orders.filter(date_format(col("o_orderdate"), "yyyy-MM") === "1997-01")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .createOrReplaceTempView("dyn_restate")
    spark.sql(s"INSERT OVERWRITE $cat.facts.orders SELECT * FROM dyn_restate")

    val v1 = SnapshotStore.currentVersion(spark, t).get
    assert(v1 === 1L, "one statement, one commit")
    val m1 = SnapshotStore.manifest(spark, t, v1)
    assert(m1.op === "dynamic-overwrite")
    assert(m1.files.filter(f => !monthOf(f).contains("1997-01")).toSet === untouched0,
      "untouched partitions must keep their exact files (zero bytes moved)")
    assert(m0.files.filter(f => monthOf(f).contains("1997-01"))
      .forall(f => !m1.files.contains(f)),
      "every replaced-partition file of the old generation must be gone")

    // row-level truth: restated month doubled, everything else intact
    val want = orders.withColumn("o_totalprice",
      when(date_format(col("o_orderdate"), "yyyy-MM") === "1997-01",
        col("o_totalprice") * 2).otherwise(col("o_totalprice")))
      .agg(count(lit(1)), sum(round(col("o_totalprice") * 100))).head()
    val got = spark.sql(
      s"SELECT count(*), sum(round(o_totalprice * 100)) FROM $cat.facts.orders").head()
    assert(got === want)
  }

  test("static mode still full-replaces; unpartitioned dynamic keeps the truncate contract") {
    val (cat, wh) = freshCat()
    val t = s"$wh/facts/o2"
    val orders = Tables.orders(spark, sf())
    SnapshotStore.partitionedCommit(orders, t,
      Seq(PartitionSpec.PartField("months", "o_orderdate")))
    orders.filter(date_format(col("o_orderdate"), "yyyy-MM") === "1997-01")
      .createOrReplaceTempView("dyn_static_src")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try spark.sql(s"INSERT OVERWRITE $cat.facts.o2 SELECT * FROM dyn_static_src")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    assert(spark.sql(s"SELECT count(*) FROM $cat.facts.o2").head().getLong(0) ===
      spark.sql("SELECT count(*) FROM dyn_static_src").head().getLong(0),
      "static INSERT OVERWRITE is a full replace")

    // unpartitioned table + dynamic conf → full replace (Spark's
    // unpartitioned-table contract), exactly as before
    val t3 = s"$wh/facts/o3"
    SnapshotStore.commit(orders.limit(100), t3)
    orders.limit(10).createOrReplaceTempView("dyn_unpart_src")
    spark.sql(s"INSERT OVERWRITE $cat.facts.o3 SELECT * FROM dyn_unpart_src")
    assert(spark.sql(s"SELECT count(*) FROM $cat.facts.o3").head().getLong(0) === 10L)
  }

  test("mixed spec generations refuse dynamic overwrite instead of guessing") {
    val (cat, wh) = freshCat()
    val t = s"$wh/facts/o4"
    val orders = Tables.orders(spark, sf())
    SnapshotStore.partitionedCommit(orders, t,
      Seq(PartitionSpec.PartField("months", "o_orderdate")))
    spark.sql(s"CALL $cat.system.evolve_partition_spec('facts.o4', 'days:o_orderdate')")
    orders.limit(50).createOrReplaceTempView("dyn_mixed_src")
    val e = intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE $cat.facts.o4 SELECT * FROM dyn_mixed_src")
    }
    assert(e.getMessage.contains("generation") || e.getMessage.contains("compact"),
      s"must refuse with the generations message, got: ${e.getMessage}")
    // and the table is untouched — refusal, not partial damage
    assert(spark.sql(s"SELECT count(*) FROM $cat.facts.o4").head().getLong(0) ===
      orders.count())
  }
}
