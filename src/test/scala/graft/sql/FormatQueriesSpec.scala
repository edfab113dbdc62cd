package graft.sql

import graft.SparkSuite
import graft.queries.FormatQueries
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Format-axis properties the oracle compare can't see: exact double
  * fidelity through text encodings, pushdown reaching the ORC scan,
  * schema'd (inference-free) reads, and compaction's snapshot isolation.
  * SmokeSpec + the `fm_*`/`dt_compact` oracles cover end-to-end values;
  * these tests pin the WHY of each round trip. */
class FormatQueriesSpec extends SparkSuite {

  test("csv round trip preserves doubles bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("fmspec-csv").toString
    val src = Tables.orders(spark, sf()).select(col("o_orderkey"), col("o_totalprice"))
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema("o_orderkey BIGINT, o_totalprice DOUBLE")
      .option("header", "true").csv(dir)
    // exact equality join: any double whose text repr re-parses to a
    // different bit pattern would fall out of the inner join
    val n = src.count()
    val matched = src.alias("a").join(back.alias("b"),
      col("a.o_orderkey") === col("b.o_orderkey") &&
        col("a.o_totalprice") === col("b.o_totalprice")).count()
    assert(matched === n, "a double changed value through the CSV text round trip")
  }

  test("orc read-back pushes the date filter into the scan") {
    val dir = java.nio.file.Files.createTempDirectory("fmspec-orc").toString
    Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), to_date(col("l_shipdate")).alias("sd"))
      .write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir)
      .filter(col("sd").between(lit("1996-01-01"), lit("1996-12-31")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in ORC scan:\n$plan")
    assert(plan.contains("sd"), s"date predicate not pushed to the ORC scan:\n$plan")
  }

  test("jsonl read-back carries the explicit nested schema, not an inferred one") {
    val dir = java.nio.file.Files.createTempDirectory("fmspec-json").toString
    Tables.customer(spark, sf())
      .select(col("c_custkey"),
        struct(col("c_name").alias("name"), col("c_mktsegment").alias("segment")).alias("profile"))
      .write.mode("overwrite").json(dir)
    val schema = "c_custkey BIGINT, profile STRUCT<name: STRING, segment: STRING>"
    val back = spark.read.schema(schema).json(dir)
    assert(back.schema === org.apache.spark.sql.types.StructType.fromDDL(schema))
    val bad = back.filter(col("profile.name").isNull || col("profile.segment").isNull).count()
    assert(bad === 0, "nested fields lost through the JSON-lines round trip")
  }

  test("text-lines parse is lossless: every document comes back typed, no nulls") {
    val parsed = FormatQueries.fmTextLines(spark, sf())
    val total = parsed.agg(sum(col("n_docs"))).head.getLong(0)
    assert(total === Tables.documents(spark, sf()).count())
  }

  test("binaryFile ingestion returns the exact bytes written") {
    val out = FormatQueries.fmBinaryFiles(spark, sf()).collect()
    assert(out.length === 8)
    val expected = Tables.documents(spark, sf())
      .filter(col("doc_id") < 8)
      .select(col("doc_id"), md5(col("text")).alias("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getAs[String]("content_md5") === expected(r.getAs[Long]("doc_id")))
    }
  }

  test("xml round trip escapes markup-significant content losslessly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fmspec-xml").toString
    val src = Seq(
      (1L, """a < b && "c" > 'd'"""),
      (2L, "<order><nested/></order>"),
      (3L, "plain")).toDF("id", "payload")
    src.write.mode("overwrite").format("xml")
      .option("rootTag", "rows").option("rowTag", "row").save(dir)
    val back = spark.read.format("xml")
      .schema("id BIGINT, payload STRING").option("rowTag", "row").load(dir)
    val matched = src.alias("a").join(back.alias("b"),
      col("a.id") === col("b.id") && col("a.payload") === col("b.payload")).count()
    assert(matched === 3, "markup content changed through the XML round trip")
  }

  test("mergeSchema surfaces generation-2 columns with NULLs for old rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fmspec-evolve").toString
    Seq((1L, 10.0)).toDF("k", "v").write.mode("overwrite").parquet(dir)
    Seq((2L, 20.0, "new")).toDF("k", "v", "tag").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted === Array("k", "tag", "v"))
    val rows = merged.orderBy("k").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("tag")), "gen-1 row must NULL the added column")
    assert(rows(1).getAs[String]("tag") === "new")
  }

  test("PERMISSIVE quarantines the raw corrupt line; FAILFAST dies on it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fmspec-corrupt").toString
    Seq("""{"k": 1}""", "{definitely not json").toDF("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    val schema = "k BIGINT, _corrupt_record STRING"
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    try {
      assert(permissive.count() === 2)
      val bad = permissive.filter(col("_corrupt_record").isNotNull).collect()
      assert(bad.length === 1)
      assert(bad(0).getAs[String]("_corrupt_record") === "{definitely not json")
      assert(bad(0).isNullAt(bad(0).fieldIndex("k")), "corrupt row must not fabricate fields")
      intercept[org.apache.spark.SparkException] {
        spark.read.schema("k BIGINT").option("mode", "FAILFAST").json(dir)
          .write.format("noop").mode("overwrite").save()
      }
    } finally permissive.unpersist()
  }

  test("dt_compact: compaction shrinks to ~1 file and never rewrites history") {
    val table = java.nio.file.Files.createTempDirectory("fmspec-compact").toString + "/ev"
    val ev = Tables.events(spark, sf())
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").alias("value_cents"))
    graft.store.SnapshotStore.commit(ev.repartition(16), table)
    graft.store.SnapshotStore.deleteCommit(spark, table, Seq("event_id"),
      pmod(col("event_id"), lit(10)) === 0)
    val liveBefore = graft.store.SnapshotStore.read(spark, table)
      .agg(count(lit(1)), sum(col("value_cents"))).head
    val (before, after, _, v) =
      graft.ops.Bucketing.compactCommit(spark, table, targetBytes = 1L << 30)
    assert(before === 16 && after === 1)
    // the compacted version is the new current, and reads identically
    assert(graft.store.SnapshotStore.currentVersion(spark, table).contains(v))
    val liveAfter = graft.store.SnapshotStore.read(spark, table)
      .agg(count(lit(1)), sum(col("value_cents"))).head
    assert(liveAfter === liveBefore)
    // snapshot isolation: the PRE-compaction version still reads with its
    // deletion vectors applied, from the original 16-file layout
    val prior = graft.store.SnapshotStore.readVersion(spark, table, v - 1)
      .agg(count(lit(1)), sum(col("value_cents"))).head
    assert(prior === liveBefore)
  }
}
