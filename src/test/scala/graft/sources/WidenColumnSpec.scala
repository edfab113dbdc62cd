package graft.sources

import graft.SparkSuite
import graft.store.SnapshotStore
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `ALTER TABLE ... ALTER COLUMN ... TYPE` widening via metadata-only
  * commits (int → bigint, float → double): old files keep their narrow
  * physical type, new files carry the wide one, and every reader path
  * hands files the wide read schema (Spark's parquet readers upcast
  * INT32→long / FLOAT→double natively). The widen commit pins the
  * table's logical schema in the manifest because footer merge cannot
  * reconcile INT32 and INT64 generations. */
class WidenColumnSpec extends SparkSuite {

  import spark.implicits._

  private def catalog(root: String): String = {
    val cat = s"gwiden${math.abs(root.hashCode % 100000)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
    cat
  }

  test("widen int->bigint: both file generations read exactly on every path") {
    val root = Files.createTempDirectory("widen-wh").toString
    val t = s"$root/ns/m"
    SnapshotStore.commit(
      Seq((1, 10.5f, "a"), (2, 20.5f, "b"), (3, 30.5f, "c")).toDF("n", "x", "s"), t)
    val cat = catalog(root)
    spark.sql(s"ALTER TABLE $cat.ns.m ALTER COLUMN n TYPE BIGINT")

    val m1 = SnapshotStore.manifest(spark, t, 1L)
    assert(m1.op == "widen-column" && m1.widens == Seq(("n", "bigint")))
    assert(m1.schemaJson.nonEmpty, "the widen commit must pin the logical schema")
    // same FILES — a metadata-only commit
    assert(SnapshotStore.dataFiles(spark, m1).sorted ==
      SnapshotStore.dataFiles(spark, SnapshotStore.manifest(spark, t, 0L)).sorted)

    // a wide-generation append (logical schema now has n: bigint)
    spark.sql(s"INSERT INTO $cat.ns.m VALUES (CAST(4000000000 AS BIGINT), CAST(40.5 AS FLOAT), 'd')")

    // engine path
    val eng = SnapshotStore.read(spark, t)
    assert(eng.schema("n").dataType === LongType)
    assert(eng.orderBy("n").select("n").as[Long].collect().toSeq ===
      Seq(1L, 2L, 3L, 4000000000L))
    // DSv2 path: values, filters (stats pruning over narrow sidecar
    // entries must stay numeric-sound), aggregates across generations
    assert(spark.sql(s"SELECT CAST(sum(n) AS BIGINT) FROM $cat.ns.m").head().getLong(0) ===
      4000000006L)
    assert(spark.sql(s"SELECT s FROM $cat.ns.m WHERE n = 2").head().getString(0) === "b")
    assert(spark.sql(s"SELECT s FROM $cat.ns.m WHERE n = 4000000000").head().getString(0) === "d")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.m WHERE n > 2").head().getLong(0) === 2L)
  }

  test("widen float->double; row path (DV scan) upcasts narrow files") {
    val root = Files.createTempDirectory("widen-dv").toString
    val t = s"$root/ns/f"
    SnapshotStore.commit(
      Seq((1L, 1.25f), (2L, 2.25f), (3L, 3.25f)).toDF("id", "v"), t)
    val cat = catalog(root)
    spark.sql(s"ALTER TABLE $cat.ns.f ALTER COLUMN v TYPE DOUBLE")
    // DVs AFTER the widen: the anti-join read and the DSv2 DV scan
    // both serve the widened column from narrow files
    SnapshotStore.deleteCommit(spark, t, Seq("id"), col("id") === 2L)
    val eng = SnapshotStore.read(spark, t).orderBy("id")
    assert(eng.schema("v").dataType === DoubleType)
    assert(eng.select("v").as[Double].collect().toSeq === Seq(1.25d, 3.25d))
    val dsv2 = spark.sql(s"SELECT v FROM $cat.ns.f ORDER BY id")
    assert(dsv2.collect().map(_.getDouble(0)).toSeq === Seq(1.25d, 3.25d))
  }

  test("bloom index on a widened column never false-negative-prunes") {
    val root = Files.createTempDirectory("widen-bloom").toString
    val t = s"$root/ns/b"
    SnapshotStore.commit(
      spark.range(0, 2000).select(col("id").cast("int").alias("k"),
        col("id").alias("payload")).repartition(4), t)
    graft.ops.BloomIndex.bloomCommit(spark, t, Seq("k"))
    val cat = catalog(root)
    // pre-widen sanity: the index prunes
    val pre = spark.sql(s"SELECT payload FROM $cat.ns.b WHERE k = 7")
    assert(pre.head().getLong(0) === 7L)
    spark.sql(s"ALTER TABLE $cat.ns.b ALTER COLUMN k TYPE BIGINT")
    // post-widen: the narrow-hashed index MUST NOT prune (int and long
    // hash differently) — the lookup still returns the row
    val post = spark.sql(s"SELECT payload FROM $cat.ns.b WHERE k = 7")
    assert(post.head().getLong(0) === 7L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.b WHERE k IN (3, 1999)")
      .head().getLong(0) === 2L)
  }

  test("rename-after-widen keeps the widening; compaction materializes both away") {
    val root = Files.createTempDirectory("widen-rn").toString
    val t = s"$root/ns/r"
    SnapshotStore.commit(Seq((1, "a"), (2, "b")).toDF("n", "s"), t)
    val cat = catalog(root)
    spark.sql(s"ALTER TABLE $cat.ns.r ALTER COLUMN n TYPE BIGINT")
    spark.sql(s"ALTER TABLE $cat.ns.r RENAME COLUMN n TO num")
    val m = SnapshotStore.manifest(spark, t,
      SnapshotStore.currentVersion(spark, t).get)
    assert(m.widens == Seq(("num", "bigint")), "the widening follows the rename")
    val renamed = SnapshotStore.read(spark, t)
    assert(renamed.schema("num").dataType === LongType)
    assert(renamed.orderBy("num").select("num").as[Long].collect().toSeq === Seq(1L, 2L))
    assert(spark.sql(s"SELECT s FROM $cat.ns.r WHERE num = 2").head().getString(0) === "b")
    // full rewrite: wide physical types, empty mapping and widens
    graft.ops.Bucketing.compactCommit(spark, t, 256L << 20)
    val mc = SnapshotStore.manifest(spark, t,
      SnapshotStore.currentVersion(spark, t).get)
    assert(mc.widens.isEmpty && mc.renames.isEmpty,
      "compaction must materialize the widening and the mapping away")
    assert(DataType.fromJson(mc.schemaJson).asInstanceOf[StructType]("num").dataType
      === LongType, "the re-pinned schema carries the wide type under the new name")
    val phys = spark.read.parquet(SnapshotStore.dataFiles(spark, mc): _*)
    assert(phys.schema("num").dataType === LongType, "rewritten files carry the wide type")
    assert(spark.sql(s"SELECT CAST(sum(num) AS BIGINT) FROM $cat.ns.r").head().getLong(0) === 3L)
  }

  test("refusals: non-widening changes, layout columns; ADD COLUMNS after widen grows the pinned schema") {
    val root = Files.createTempDirectory("widen-ref").toString
    val t = s"$root/ns/g"
    SnapshotStore.partitionedCommit(
      Seq((1, java.time.LocalDateTime.of(2024, 1, 1, 0, 0), 1.0f))
        .toDF("n", "ts", "x"),
      t, Seq(graft.store.PartitionSpec.PartField("months", "ts")))
    val cat = catalog(root)
    // long -> int narrows; string is not numeric; both refuse
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.g ALTER COLUMN n TYPE STRING") }
    assert(e1.getMessage.contains("full rewrite"), e1.getMessage)
    // a partition source column refuses (directory facts key by it)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.g ALTER COLUMN ts TYPE STRING") }
    assert(e2.getMessage.contains("full rewrite") || e2.getMessage.contains("layout"),
      e2.getMessage)
    spark.sql(s"ALTER TABLE $cat.ns.g ALTER COLUMN n TYPE BIGINT")
    // schema evolution after the widen: the pinned schema grows
    spark.sql(s"ALTER TABLE $cat.ns.g ADD COLUMNS (note STRING)")
    val m = SnapshotStore.manifest(spark, t,
      SnapshotStore.currentVersion(spark, t).get)
    val pinned = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
    assert(pinned.fieldNames.contains("note"), s"pinned schema must grow: $pinned")
    assert(pinned("n").dataType === LongType)
    val widened = spark.sql(s"SELECT n, note FROM $cat.ns.g ORDER BY n")
    assert(widened.schema("n").dataType === LongType)
    assert(widened.collect().map(r => (r.getLong(0), r.isNullAt(1))).toSeq === Seq((1L, true)))
  }
}
