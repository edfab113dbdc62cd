package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Column DEFAULT values at CREATE TABLE (the
  * SUPPORT_COLUMN_DEFAULT_VALUE catalog capability): Spark encodes the
  * default in the schema's field metadata, the pinned `schemajson=`
  * persists it across sessions, and Spark's own analyzer fills omitted
  * columns and explicit DEFAULT keywords on INSERT — rows land
  * physically complete, so reads need no default logic at all.
  * `ALTER TABLE ... ADD COLUMN ... DEFAULT` stays refused: old files
  * would need exists-default fill on read, which this store does not
  * promise. */
class ColumnDefaultsSpec extends SparkSuite {

  private def freshCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("defwh").toString
    val cat = "gdef_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("CREATE TABLE with DEFAULTs: INSERT fills omitted columns and DEFAULT keywords") {
    val (cat, _) = freshCat()
    spark.sql(
      s"""CREATE TABLE $cat.facts.t (
            id BIGINT,
            status STRING DEFAULT 'new',
            score DOUBLE DEFAULT 1.5)""")
    spark.sql(s"INSERT INTO $cat.facts.t (id) VALUES (1)")
    spark.sql(s"INSERT INTO $cat.facts.t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql(s"INSERT INTO $cat.facts.t VALUES (3, 'done', 9.9)")
    val got = spark.sql(s"SELECT * FROM $cat.facts.t ORDER BY id").collect()
    assert(got.map(_.getString(1)).toSeq === Seq("new", "new", "done"))
    assert(got.map(_.getDouble(2)).toSeq === Seq(1.5, 1.5, 9.9))
  }

  test("defaults persist across catalog instances (pinned schema metadata)") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.facts.t2 (id BIGINT, tag STRING DEFAULT 'x')")
    spark.sql(s"INSERT INTO $cat.facts.t2 (id) VALUES (1)")

    val cat2 = "gdef2_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat2", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat2.warehouse", wh)
    spark.sql(s"INSERT INTO $cat2.facts.t2 (id) VALUES (2)")
    val got = spark.sql(s"SELECT * FROM $cat2.facts.t2 ORDER BY id").collect()
    assert(got.map(_.getString(1)).toSeq === Seq("x", "x"),
      "the default must survive a fresh catalog instance via the pinned schema")
  }

  test("ALTER TABLE ADD COLUMN ... DEFAULT stays refused (no exists-default read path)") {
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.facts.t3 (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.facts.t3 VALUES (1)")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.facts.t3 ADD COLUMNS (c INT DEFAULT 7)")
    }
    assert(e.getMessage.contains("no position/default") ||
      e.getMessage.toLowerCase.contains("default"), e.getMessage)
    // plain nullable add still works
    spark.sql(s"ALTER TABLE $cat.facts.t3 ADD COLUMNS (d INT)")
    assert(spark.sql(s"SELECT d FROM $cat.facts.t3").collect()(0).isNullAt(0))
  }
}
