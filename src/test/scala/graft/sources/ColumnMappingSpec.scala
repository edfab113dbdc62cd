package graft.sources

import graft.SparkSuite
import graft.store.{ColumnMapping, SnapshotStore}
import org.apache.spark.sql.functions._

/** `ALTER TABLE ... RENAME/DROP COLUMN` as metadata-only commits
  * (Iceberg-style name mapping): files written before a rename keep
  * the old physical name, files after carry the new one, and every
  * read path — DSv2 scan (vectorized + fallback), engine read, filters
  * over the renamed column — binds each file through the manifest's
  * mapping. A full rewrite materializes the mapping away. */
class ColumnMappingSpec extends SparkSuite {

  private def freshWh(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def withCatalog(tag: String)(body: (String, String) => Unit): Unit = {
    val wh = freshWh(tag)
    val cat = "gcm_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body(cat, wh)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("RENAME COLUMN is metadata-only; old+new file generations read exactly") {
    withCatalog("cm-rename") { (cat, wh) =>
      val root = s"$wh/facts/orders"
      val orders = graft.sources.Tables.orders(spark, sf())
        .select("o_orderkey", "o_custkey", "o_totalprice")
      SnapshotStore.commit(orders.repartition(3), root) // gen A: physical o_totalprice
      val m0 = SnapshotStore.manifest(spark, root, 0L)

      spark.sql(s"ALTER TABLE $cat.facts.orders RENAME COLUMN o_totalprice TO price")
      val m1 = SnapshotStore.manifest(spark, root, 1L)
      assert(m1.op === "rename-column" && m1.files === m0.files,
        "a rename must move zero data")
      assert(m1.renames === Seq(("price", Seq("o_totalprice"))))

      // the logical schema renames; INSERT writes the NEW physical name
      assert(spark.table(s"$cat.facts.orders").schema.fieldNames.toSeq
        === Seq("o_orderkey", "o_custkey", "price"))
      orders.createOrReplaceTempView("gcm_src")
      spark.sql(
        s"""INSERT INTO $cat.facts.orders
            SELECT o_orderkey + 9000000, o_custkey, o_totalprice FROM gcm_src""")

      // cross-generation read: exact values from BOTH physical spellings
      val got = spark.sql(
        s"""SELECT CAST(count(*) AS BIGINT), CAST(sum(o_orderkey) AS BIGINT),
                   CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
            FROM $cat.facts.orders""").head()
      val cents = orders.agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
        .head().getLong(0)
      assert(got.getLong(0) === orders.count() * 2)
      assert(got.getLong(1) === orders.agg(sum("o_orderkey")).head().getLong(0) * 2
        + 9000000L * orders.count())
      assert(got.getLong(2) === cents * 2)

      // filters on the renamed column stay exact across generations —
      // old files' sidecar stats bind through the alias
      val cut = 50000.0
      val wantFiltered = orders.filter(col("o_totalprice") > cut).count() * 2
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.facts.orders WHERE price > $cut").head().getLong(0)
        === wantFiltered)

      // engine-level read resolves the same logical view
      val eng = SnapshotStore.read(spark, root)
      assert(eng.schema.fieldNames.toSeq === Seq("o_orderkey", "o_custkey", "price"))
      assert(eng.agg(sum(expr("CAST(round(price * 100) AS BIGINT)"))).head().getLong(0)
        === cents * 2, "engine-level read must resolve the same logical values")

      // a full rewrite MATERIALIZES the mapping: fresh manifest, no renames
      graft.ops.Bucketing.compactCommit(spark, root, 256L << 20)
      val mC = SnapshotStore.manifest(spark, root,
        SnapshotStore.currentVersion(spark, root).get)
      assert(mC.renames.isEmpty, "compaction must clear the mapping")
      assert(spark.sql(s"SELECT count(*) FROM $cat.facts.orders WHERE price > $cut")
        .head().getLong(0) === wantFiltered)
    }
  }

  test("chained renames and DELETE on a renamed table stay correct") {
    withCatalog("cm-chain") { (cat, wh) =>
      val root = s"$wh/facts/t"
      SnapshotStore.commit(
        spark.range(0, 1000).selectExpr("id", "id * 2 AS a"), root)
      spark.sql(s"ALTER TABLE $cat.facts.t RENAME COLUMN a TO b")
      spark.sql(s"INSERT INTO $cat.facts.t SELECT id + 1000, id * 2 FROM range(0, 500)")
      spark.sql(s"ALTER TABLE $cat.facts.t RENAME COLUMN b TO c")
      val m = SnapshotStore.manifest(spark, root,
        SnapshotStore.currentVersion(spark, root).get)
      assert(m.renames === Seq(("c", Seq("b", "a"))), "alias chains must accumulate")
      spark.sql(s"INSERT INTO $cat.facts.t SELECT id + 2000, id * 2 FROM range(0, 250)")
      assert(spark.sql(s"SELECT CAST(sum(c) AS BIGINT) FROM $cat.facts.t").head().getLong(0)
        === (0L until 1000L).map(_ * 2).sum + (0L until 500L).map(_ * 2).sum
          + (0L until 250L).map(_ * 2).sum)

      // row-level DELETE across generations (CoW rewrite binds per file)
      spark.sql(s"DELETE FROM $cat.facts.t WHERE c % 4 = 0")
      assert(spark.sql(s"SELECT count(*) FROM $cat.facts.t WHERE c % 4 = 0")
        .head().getLong(0) === 0L)
      assert(spark.sql(s"SELECT count(*) FROM $cat.facts.t").head().getLong(0) > 0L)
    }
  }

  test("DROP COLUMN hides values everywhere; retired names refuse re-ADD") {
    withCatalog("cm-drop") { (cat, wh) =>
      val root = s"$wh/facts/t"
      SnapshotStore.commit(
        spark.range(0, 100).selectExpr("id", "id * 3 AS secret", "id * 5 AS keep"), root)
      spark.sql(s"ALTER TABLE $cat.facts.t DROP COLUMN secret")
      val m = SnapshotStore.manifest(spark, root, 1L)
      assert(m.op === "drop-column" && m.droppedCols === Seq("secret"))
      assert(spark.table(s"$cat.facts.t").schema.fieldNames.toSeq === Seq("id", "keep"))
      assert(SnapshotStore.read(spark, root).schema.fieldNames.toSeq === Seq("id", "keep"))
      intercept[Exception](spark.sql(s"SELECT secret FROM $cat.facts.t").collect())
      // re-ADD of the retired name must refuse — old files still hold it
      val e = intercept[Exception](
        spark.sql(s"ALTER TABLE $cat.facts.t ADD COLUMNS (secret BIGINT)"))
      def chain(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
      assert(chain(e).exists(_.contains("retired")))
      // a fresh name adds fine
      spark.sql(s"ALTER TABLE $cat.facts.t ADD COLUMNS (extra BIGINT)")
      assert(spark.table(s"$cat.facts.t").schema.fieldNames.toSeq
        === Seq("id", "keep", "extra"))
    }
  }

  test("layout columns and recycled names refuse rename loudly") {
    withCatalog("cm-refuse") { (cat, wh) =>
      val root = s"$wh/facts/t"
      val orders = graft.sources.Tables.orders(spark, sf())
      SnapshotStore.partitionedCommit(orders, root,
        Seq(graft.store.PartitionSpec.PartField("months", "o_orderdate")))
      def chain(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
      // partition source: refuse
      val e1 = intercept[Exception](spark.sql(
        s"ALTER TABLE $cat.facts.t RENAME COLUMN o_orderdate TO od"))
      assert(chain(e1).exists(_.contains("layout column")))
      // live DV key: refuse
      SnapshotStore.deleteCommit(spark, root, Seq("o_orderkey"),
        col("o_orderkey") === 1L)
      val e2 = intercept[Exception](spark.sql(
        s"ALTER TABLE $cat.facts.t RENAME COLUMN o_orderkey TO ok2"))
      assert(chain(e2).exists(_.contains("layout column")))
      // renaming onto a retired physical name: refuse
      spark.sql(s"ALTER TABLE $cat.facts.t RENAME COLUMN o_orderpriority TO prio")
      val e3 = intercept[Exception](spark.sql(
        s"ALTER TABLE $cat.facts.t RENAME COLUMN o_orderstatus TO o_orderpriority"))
      assert(chain(e3).exists(_.contains("retired")))
    }
  }

  test("ColumnMapping unit rules: logical schema and frame resolution") {
    import org.apache.spark.sql.types._
    val m = SnapshotStore.Manifest("d", Nil, Nil,
      renames = Seq(("c", Seq("b", "a"))), droppedCols = Seq("gone"))
    val base = new StructType().add("id", LongType).add("a", LongType)
      .add("c", LongType).add("gone", StringType)
    // first occurrence keeps the position; aliases fold; dropped hide
    assert(ColumnMapping.logicalSchema(base, m).fieldNames.toSeq === Seq("id", "c"))
    import spark.implicits._
    val df = Seq((1L, Some(10L), Option.empty[Long]), (2L, None, Some(20L)))
      .toDF("id", "a", "c")
    val got = ColumnMapping.applyToFrame(df, m).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 10L), (2L, 20L)),
      "the logical column coalesces across physical spellings")
  }
}
