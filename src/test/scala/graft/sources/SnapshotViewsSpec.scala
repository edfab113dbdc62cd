package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Persisted DSv2 views ([[SnapshotViews]] + SnapshotCatalog's
  * ViewCatalog): `CREATE VIEW cat.ns.v AS SELECT ...` writes one
  * atomic metadata file under the warehouse; any catalog instance
  * pointing at the same warehouse (a fresh session/cluster) resolves
  * it by name. The engine-durable analog of the reference's Athena
  * view layer (`scripts/sql/create_views.sql`). */
class SnapshotViewsSpec extends SparkSuite {

  private def freshCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("viewwh").toString
    val cat = "gview_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("CREATE VIEW / SELECT / SHOW VIEWS / DROP — full SQL lifecycle") {
    val (cat, _) = freshCat()
    graft.store.SnapshotStore.commit(
      graft.sources.Tables.nation(spark, sf()), s"${spark.conf.get(s"spark.sql.catalog.$cat.warehouse")}/facts/nation")

    spark.sql(
      s"""CREATE VIEW $cat.facts.big_nations AS
          SELECT n_regionkey, count(*) AS n
          FROM $cat.facts.nation GROUP BY n_regionkey HAVING count(*) > 3""")

    val got = spark.sql(s"SELECT * FROM $cat.facts.big_nations ORDER BY n_regionkey")
    val want = graft.sources.Tables.nation(spark, sf())
      .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
      .filter(col("n") > 3).orderBy("n_regionkey")
    assert(got.collect().toSeq === want.collect().toSeq)

    val shown = spark.sql(s"SHOW VIEWS IN $cat.facts").collect().map(_.getString(1))
    assert(shown.contains("big_nations"), s"SHOW VIEWS must list it, got ${shown.toSeq}")

    spark.sql(s"DROP VIEW $cat.facts.big_nations")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM $cat.facts.big_nations").collect()
    }
  }

  test("views persist across catalog instances (fresh-session durability)") {
    val (cat, wh) = freshCat()
    graft.store.SnapshotStore.commit(
      graft.sources.Tables.region(spark, sf()), s"$wh/facts/region")
    spark.sql(
      s"""CREATE VIEW $cat.facts.regions_v AS
          SELECT r_regionkey, upper(r_name) AS rname FROM $cat.facts.region""")

    // a SECOND catalog name over the SAME warehouse = a fresh session's
    // view of the world: no shared JVM registry, only the files
    val cat2 = "gview2_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat2", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat2.warehouse", wh)
    val got = spark.sql(s"SELECT * FROM $cat2.facts.regions_v ORDER BY r_regionkey").collect()
    assert(got.length === 5 && got.forall(_.getString(1).forall(c => !c.isLower)),
      "the second catalog must resolve the persisted view from the warehouse")
  }

  test("CREATE OR REPLACE, ALTER VIEW properties, and name-collision guards") {
    val (cat, wh) = freshCat()
    graft.store.SnapshotStore.commit(
      graft.sources.Tables.nation(spark, sf()), s"$wh/facts/nation")

    spark.sql(s"CREATE VIEW $cat.facts.v1 AS SELECT n_nationkey FROM $cat.facts.nation")
    spark.sql(
      s"CREATE OR REPLACE VIEW $cat.facts.v1 AS SELECT n_name FROM $cat.facts.nation")
    assert(spark.sql(s"SELECT * FROM $cat.facts.v1").schema.fieldNames.toSeq === Seq("n_name"),
      "REPLACE must swap the definition")

    def viewProps: Map[String, String] = {
      import scala.jdk.CollectionConverters._
      spark.sessionState.catalogManager.catalog(cat).asInstanceOf[SnapshotCatalog]
        .loadView(org.apache.spark.sql.connector.catalog.Identifier.of(Array("facts"), "v1"))
        .properties.asScala.toMap
    }
    spark.sql(s"ALTER VIEW $cat.facts.v1 SET TBLPROPERTIES ('team' = 'etl')")
    assert(viewProps.get("team").contains("etl"), s"property must persist, got $viewProps")
    spark.sql(s"ALTER VIEW $cat.facts.v1 UNSET TBLPROPERTIES ('team')")
    assert(!viewProps.contains("team"), "UNSET must remove the property")

    // collision guards: a view can't shadow a table, a table can't
    // shadow a view
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"CREATE VIEW $cat.facts.nation AS SELECT 1 AS one")
    }
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"CREATE TABLE $cat.facts.v1 AS SELECT 1 AS one")
    }
  }

  test("view over a view; dropped base table fails the view loudly") {
    val (cat, wh) = freshCat()
    graft.store.SnapshotStore.commit(
      graft.sources.Tables.orders(spark, sf()), s"$wh/facts/orders")
    spark.sql(
      s"""CREATE VIEW $cat.facts.daily AS
          SELECT o_orderpriority, count(*) AS n FROM $cat.facts.orders
          GROUP BY o_orderpriority""")
    spark.sql(
      s"""CREATE VIEW $cat.facts.daily_top AS
          SELECT * FROM $cat.facts.daily ORDER BY n DESC LIMIT 2""")
    assert(spark.sql(s"SELECT * FROM $cat.facts.daily_top").collect().length === 2)
  }

  test("ALTER VIEW ... AS swaps the definition; ANALYZE TABLE routes to the NDV commit") {
    val (cat, wh) = freshCat()
    graft.store.SnapshotStore.commit(
      graft.sources.Tables.nation(spark, sf()), s"$wh/facts/nation")
    spark.sql(s"CREATE VIEW $cat.facts.v5 AS SELECT n_nationkey FROM $cat.facts.nation")
    spark.sql(s"ALTER VIEW $cat.facts.v5 SET TBLPROPERTIES ('team' = 'etl')")
    spark.sql(s"ALTER VIEW $cat.facts.v5 AS SELECT n_name, n_regionkey FROM $cat.facts.nation")
    val df = spark.sql(s"SELECT * FROM $cat.facts.v5")
    assert(df.schema.fieldNames.toSeq === Seq("n_name", "n_regionkey"))
    assert(df.count() === 25)
    // properties survive the redefinition
    import scala.jdk.CollectionConverters._
    val props = spark.sessionState.catalogManager.catalog(cat).asInstanceOf[SnapshotCatalog]
      .loadView(org.apache.spark.sql.connector.catalog.Identifier.of(Array("facts"), "v5"))
      .properties.asScala
    assert(props.get("team").contains("etl"), s"props must survive ALTER AS: $props")

    // ANALYZE TABLE ... FOR COLUMNS → ndvfile= manifest surface
    val rows = spark.sql(
      s"ANALYZE TABLE $cat.facts.nation COMPUTE STATISTICS FOR COLUMNS n_regionkey").collect()
    assert(rows.length === 1 && rows(0).getString(1) === "n_regionkey")
    val t = s"$wh/facts/nation"
    val m = graft.store.SnapshotStore.manifest(spark, t,
      graft.store.SnapshotStore.currentVersion(spark, t).get)
    assert(m.ndvFile.nonEmpty, "analyze must publish the NDV sidecar")

    // ALL COLUMNS picks every sketchable column
    spark.sql(s"ANALYZE TABLE $cat.facts.nation COMPUTE STATISTICS FOR ALL COLUMNS")
    val m2 = graft.store.SnapshotStore.manifest(spark, t,
      graft.store.SnapshotStore.currentVersion(spark, t).get)
    assert(m2.ndvFile.nonEmpty)
  }

  test("time travel over a view name fails loudly instead of ignoring the version") {
    val (cat, wh) = freshCat()
    graft.store.SnapshotStore.commit(
      graft.sources.Tables.region(spark, sf()), s"$wh/facts/region")
    spark.sql(s"CREATE VIEW $cat.facts.v6 AS SELECT r_regionkey FROM $cat.facts.region")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM $cat.facts.v6 VERSION AS OF 0").collect()
    }
    // the plain read still resolves
    assert(spark.sql(s"SELECT * FROM $cat.facts.v6").count() === 5)
  }

  test("another catalog's explicit name is never hijacked into the graft catalog") {
    val (cat, wh) = freshCat()
    val cm = spark.sessionState.catalogManager
    spark.sql(s"SET CATALOG $cat")
    try {
      // view DDL aimed at the SESSION catalog must reach it, not land
      // in the graft warehouse under a bogus ['spark_catalog','default']
      // namespace just because a SnapshotCatalog is current
      spark.sql("CREATE VIEW spark_catalog.default.hj_v AS SELECT 1 AS x")
      assert(!SnapshotViews.exists(spark, wh,
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("spark_catalog", "default"), "hj_v")),
        "the view must NOT exist in the graft warehouse")
      assert(spark.sql("SELECT x FROM spark_catalog.default.hj_v").collect()
        .map(_.getInt(0)).toSeq === Seq(1),
        "the view must resolve through the session catalog")
    } finally {
      spark.sql("SET CATALOG spark_catalog")
      spark.sql("DROP VIEW IF EXISTS spark_catalog.default.hj_v")
    }
    assert(cm.currentCatalog.name === "spark_catalog")
  }

  test("view body resolves in the DEFINER's catalog context, not the reader's") {
    val (cat, wh) = freshCat()
    graft.store.SnapshotStore.commit(
      graft.sources.Tables.nation(spark, sf()), s"$wh/facts/nation")
    val want = graft.sources.Tables.nation(spark, sf()).count()
    spark.sql(s"SET CATALOG $cat")
    try {
      // the body's table reference is NOT catalog-qualified: it only
      // resolves because $cat is current AT CREATE TIME
      spark.sql(s"CREATE VIEW $cat.facts.unq_v AS SELECT count(*) AS c FROM facts.nation")
    } finally spark.sql("SET CATALOG spark_catalog")
    // read from a session whose current catalog is the SESSION catalog:
    // the stored body must still bind to the definer's facts.nation
    assert(spark.sql(s"SELECT c FROM $cat.facts.unq_v").collect()
      .map(_.getLong(0)).toSeq === Seq(want))
  }

  test("definer-context pin is CTE scope-aware (non-enclosing scopes exempt nothing; CTE bodies qualify)") {
    val (cat, wh) = freshCat()
    graft.store.SnapshotStore.commit(
      graft.sources.Tables.nation(spark, sf()), s"$wh/facts/nation")
    val nNation = graft.sources.Tables.nation(spark, sf()).count()
    spark.sql(s"SET CATALOG $cat")
    spark.sql("USE facts") // single-part references need a definer namespace
    try {
      // 1) a CTE DEFINITION referencing an unqualified definer table:
      //    UnresolvedWith keeps its definitions outside `children`, so
      //    a child-walking qualifier never reaches `facts.nation` here
      spark.sql(
        s"""CREATE VIEW $cat.facts.cte_body_v AS
            WITH src AS (SELECT * FROM facts.nation)
            SELECT count(*) AS c FROM src""")
      // 2) a table reference that merely SHARES a name with a CTE in a
      //    different, non-enclosing scope: the derived table's `nation`
      //    CTE must not exempt the outer unqualified `nation` reference
      spark.sql(
        s"""CREATE VIEW $cat.facts.cte_scope_v AS
            SELECT (SELECT count(*) FROM (WITH nation AS (SELECT 1 AS x) SELECT * FROM nation) d) AS inner_c,
                   count(*) AS outer_c
            FROM nation""")
    } finally spark.sql("SET CATALOG spark_catalog")
    // reader context = session catalog, where NO `nation` exists — both
    // views only answer if the pin qualified the right references and
    // left the genuinely CTE-bound one alone
    assert(spark.sql(s"SELECT c FROM $cat.facts.cte_body_v").head().getLong(0) === nNation,
      "the CTE definition's table reference must bind in the definer's context")
    val r = spark.sql(s"SELECT inner_c, outer_c FROM $cat.facts.cte_scope_v").head()
    assert(r.getLong(0) === 1L, "the enclosed scope's reference binds its own CTE")
    assert(r.getLong(1) === nNation,
      "the outer reference must qualify to the definer's table despite the name collision")
  }

  test("CREATE VIEW over a session temp view refuses (persisted views cannot dangle)") {
    val (cat, wh) = freshCat()
    graft.store.SnapshotStore.commit(
      graft.sources.Tables.region(spark, sf()), s"$wh/facts/region")
    graft.sources.Tables.region(spark, sf()).createOrReplaceTempView("tmp_region_v")
    try {
      val e = intercept[Exception] {
        spark.sql(s"CREATE VIEW $cat.facts.overtmp AS SELECT * FROM tmp_region_v")
      }
      assert(e.getMessage.contains("temporary"), e.getMessage)
    } finally spark.catalog.dropTempView("tmp_region_v")
  }
}
