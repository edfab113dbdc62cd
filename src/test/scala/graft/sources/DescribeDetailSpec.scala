package graft.sources

import graft.SparkSuite
import graft.store.{PartitionSpec, SnapshotStore}

/** The `t$detail` metadata table ([[MetaTables]], round 15) — the
  * DESCRIBE-DETAIL introspection a user needs before trusting
  * ALTER/MERGE on a table they didn't create: layout, constraints,
  * defaults, evolution state, sidecar coverage, in ONE metadata row.
  * Also pins `SHOW CREATE TABLE`, which Spark renders from the
  * reported schema + partitioning. */
class DescribeDetailSpec extends SparkSuite {

  private def freshCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("detwh").toString
    val cat = "gdet_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("$detail reports layout, constraints, defaults, and evolution state from pure metadata") {
    val (cat, wh) = freshCat()
    val t = s"$wh/facts/orders"
    SnapshotStore.partitionedCommit(Tables.orders(spark, sf()), t,
      Seq(PartitionSpec.PartField("months", "o_orderdate")))
    spark.sql(s"ALTER TABLE $cat.facts.orders ADD CONSTRAINT price_pos CHECK (o_totalprice >= 0)")
    spark.sql(s"ALTER TABLE $cat.facts.orders ADD COLUMNS (channel STRING DEFAULT 'store')")

    val rows = spark.sql(s"SELECT * FROM $cat.facts.`orders$$detail`").collect()
    assert(rows.length === 1)
    val r = rows.head
    def s(c: String) = r.getString(r.fieldIndex(c))
    def l(c: String) = r.getLong(r.fieldIndex(c))
    def b(c: String) = r.getBoolean(r.fieldIndex(c))
    assert(l("version") === 1L) // commit + ADD COLUMNS (constraint is table-level, no commit)
    assert(s("partition_spec") === "months:o_orderdate")
    assert(l("n_spec_generations") === 1L)
    assert(s("constraints").contains("price_pos CHECK"))
    assert(s("column_defaults").contains("channel DEFAULT 'store'"))
    assert(l("n_data_files") > 0 && l("n_delete_files") === 0L)
    assert(l("total_rows") === Tables.orders(spark, sf()).count(),
      "sidecar-complete tables report exact row totals")
    assert(b("has_stats_sidecar") && b("schema_pinned"))

    // evolution state shows through: rename a column, detail follows
    spark.sql(s"ALTER TABLE $cat.facts.orders RENAME COLUMN o_custkey TO cust_id")
    val r2 = spark.sql(s"SELECT renamed_cols, version FROM $cat.facts.`orders$$detail`").head()
    assert(r2.getString(0).contains("cust_id<-o_custkey"))
    assert(r2.getLong(1) === 2L)
  }

  test("SHOW CREATE TABLE renders schema and partitioning from the reported metadata") {
    val (cat, wh) = freshCat()
    spark.sql(
      s"""CREATE TABLE $cat.facts.ev (
            id BIGINT, ts TIMESTAMP, price DOUBLE)
          PARTITIONED BY (days(ts))""")
    spark.sql(s"INSERT INTO $cat.facts.ev VALUES (1, TIMESTAMP '2024-03-01 10:00:00', 5.0)")
    val ddl = spark.sql(s"SHOW CREATE TABLE $cat.facts.ev").head().getString(0)
    assert(ddl.contains("CREATE TABLE") && ddl.contains("id BIGINT"), ddl)
    assert(ddl.toLowerCase.contains("partitioned by") && ddl.contains("days(ts)"), ddl)
  }
}
