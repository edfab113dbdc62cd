package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 additions: the source/sink FORMAT axis, plus small-file
  * compaction as an oracle-checked query.
  *
  * The reference ingests multi-line JSON and lands Parquet
  * (`bronze_to_silver.py:30`, `:114-117`); those two formats are covered
  * by `f9_json`/`s2_scan` and the `wx_*` pipeline. A real lake ingests
  * more shapes than that, so the engine's claim of "every source a user
  * runs today" should include the rest of Spark's built-in format
  * surface, each proven by a round-trip whose read-back result must
  * match a DuckDB oracle computed from the original parquet:
  *
  *  - `fm_csv_roundtrip`   — CSV sink + source with an EXPLICIT schema
  *    on read. Schema-on-read matters at scale: without it Spark runs a
  *    whole extra inference scan over the files before the real job.
  *  - `fm_orc_roundtrip`   — ORC sink + source; the read-back filter is
  *    a date range, which ORC serves from stripe/row-group statistics
  *    (predicate pushdown), same as the parquet path.
  *  - `fm_jsonl_roundtrip` — JSON-lines sink + source with NESTED
  *    structs and an explicit schema, then dotted-path flattening — the
  *    reference's bronze→silver shape re-expressed on the compact
  *    line-per-record encoding streaming collectors actually emit.
  *  - `fm_text_lines`      — the `text` source: delimiter-joined lines
  *    parsed back with `split()` into typed columns. This is the
  *    raw-log ingestion path; parsing is a narrow projection, so the
  *    scan parallelizes per-line with no shuffle.
  *  - `fm_binary_files`    — the `binaryFile` source: documents written
  *    as loose files on disk and re-ingested as (path, length, content)
  *    rows — the multimodal ingestion front door (`mm_*` operate on the
  *    binary columns this source produces). The file set is bounded (8
  *    docs) because the write side is driver-local by design; the READ
  *    side is the distributed path under test.
  *  - `fm_xml_roundtrip`   — the XML source/sink (built into Spark 4):
  *    row-tagged records with an explicit schema on read. XML is the
  *    interchange shape enterprise feeds still arrive in; the round
  *    trip proves escaping and typed parse, not just happy-path text.
  *  - `fm_schema_merge`    — schema evolution across parquet file
  *    generations: `mergeSchema=true` union-reconciles footers, old
  *    rows surface added columns as NULL, coalesce supplies defaults.
  *  - `fm_corrupt_records` — PERMISSIVE-mode JSON ingestion with a
  *    `_corrupt_record` quarantine column: bad lines are booked, not
  *    fatal (FAILFAST) and not silently dropped (DROPMALFORMED).
  *  - `dt_compact`         — [[graft.ops.Bucketing.compactCommit]] over
  *    a [[graft.store.SnapshotStore]] table: a 64-file commit plus a
  *    deletion-vector commit rewritten into ~1 file as the next atomic
  *    version. The query asserts the file count actually dropped and
  *    returns the post-compaction aggregate, which must equal the
  *    oracle's plain filter — compaction is pure maintenance, invisible
  *    to readers. At 100 TB the small-file problem (per-file open cost,
  *    scheduler pressure, NameNode/listing load) is a first-class
  *    failure mode; snapshot-isolated compaction is the remedy that
  *    never blocks a concurrent reader.
  *
  * A scale note on compressed text formats: gzip is NOT splittable, so
  * one .csv.gz/.json.gz file is one task forever. That is safe here —
  * and at any scale — only because compression is applied per PART
  * file: a write with N output partitions lands N independently
  * decompressable files, so read parallelism equals the file count the
  * writer chose. The pathological shape (one multi-GB .gz) can only be
  * produced by coalescing to 1 before the write; for archival text at
  * 100 TB prefer a splittable codec or keep part files bounded
  * (`spark.sql.files.maxRecordsPerFile`).
  */
object FormatQueries {

  type Q = (SparkSession, String) => DataFrame

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** FM1: orders → gzip CSV with header → schema'd read-back → status ×
    * year aggregate. Money compared in integer cents so the text
    * round-trip of the double is exercised (Spark writes the shortest
    * repr, which parses back to the identical double). */
  val fmCsvRoundtrip: Q = (s, d) => {
    val dir = tmpDir("fmcsv") + "/orders_csv"
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), to_date(col("o_orderdate")).alias("od"))
      .write.mode("overwrite")
      .option("header", "true").option("compression", "gzip")
      .csv(dir)
    s.read
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, od DATE")
      .option("header", "true")
      .csv(dir)
      .groupBy(col("o_orderstatus"), year(col("od")).alias("yr"))
      .agg(
        count(lit(1)).alias("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long")).alias("price_cents"))
      .orderBy(col("o_orderstatus"), col("yr"))
  }

  /** FM2: lineitem → ORC → read-back with a ship-date range the format
    * can serve from stripe statistics → returnflag × linestatus
    * aggregate in exact cents. */
  val fmOrcRoundtrip: Q = (s, d) => {
    val dir = tmpDir("fmorc") + "/lineitem_orc"
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_linestatus"), to_date(col("l_shipdate")).alias("sd"))
      .write.mode("overwrite").orc(dir)
    s.read.orc(dir)
      .filter(col("sd").between(lit("1996-01-01"), lit("1996-12-31")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).alias("n_rows"),
        sum(round(col("l_quantity") * 100).cast("long")).alias("qty_cents"),
        sum(round(col("l_extendedprice") * 100).cast("long")).alias("price_cents"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** FM3: customer → nested JSON-lines → schema'd read-back → dotted
    * flatten → per-segment aggregate. The nesting (profile/account
    * structs) makes the round trip prove struct encode/decode, not just
    * scalar text. */
  val fmJsonlRoundtrip: Q = (s, d) => {
    val dir = tmpDir("fmjson") + "/customer_json"
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        struct(col("c_name").alias("name"), col("c_mktsegment").alias("segment")).alias("profile"),
        struct(col("c_nationkey").alias("nationkey"),
          round(col("c_acctbal") * 100).cast("long").alias("bal_cents")).alias("account"))
      .write.mode("overwrite").option("compression", "gzip").json(dir)
    s.read
      .schema("c_custkey BIGINT, profile STRUCT<name: STRING, segment: STRING>, " +
        "account STRUCT<nationkey: INT, bal_cents: BIGINT>")
      .json(dir)
      .select(col("c_custkey"), col("profile.segment").alias("segment"),
        col("account.nationkey").alias("nationkey"), col("account.bal_cents").alias("bal_cents"))
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).alias("n_rows"),
        sum(col("bal_cents")).alias("bal_cents"),
        countDistinct(col("nationkey")).alias("n_nations"))
      .orderBy(col("segment"))
  }

  /** FM4: documents → ctrl-A-joined lines through the `text` sink →
    * `split()` parse on read-back → lang × source dedup profile. The
    * content travels as its md5 so the line encoding never depends on
    * what bytes the text itself contains. */
  val fmTextLines: Q = (s, d) => {
    val dir = tmpDir("fmtext") + "/docs_txt"
    Tables.documents(s, d)
      .select(concat_ws("\u0001",
        col("doc_id"), col("lang"), col("source"), md5(col("text"))).alias("value"))
      .write.mode("overwrite").text(dir)
    val f = split(col("value"), "\u0001")
    s.read.text(dir)
      .select(
        f.getItem(0).cast("long").alias("doc_id"),
        f.getItem(1).alias("lang"),
        f.getItem(2).alias("source"),
        f.getItem(3).alias("text_md5"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).alias("n_docs"),
        countDistinct(col("text_md5")).alias("n_unique"))
      .orderBy(col("lang"), col("source"))
  }

  /** FM5: eight documents written as loose .txt files (driver-local by
    * design — the WRITE side is a fixture; the distributed path under
    * test is the `binaryFile` READ), re-ingested as (path, length,
    * content) rows, keyed back out of the filename. */
  val fmBinaryFiles: Q = (s, d) => {
    val dir = Fixtures.dir("fmbin", d) { r =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 8)
        .select(col("doc_id"), col("text"))
        .collect()
        .foreach { row =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(r, s"doc_${row.getLong(0)}.txt"),
            row.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
    }
    s.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.txt$", 1).cast("long").alias("doc_id"),
        col("length").alias("n_bytes"),
        md5(col("content")).alias("content_md5"))
      .orderBy(col("doc_id"))
  }

  /** FM6: orders → row-tagged XML → schema'd read-back → priority
    * aggregate. Spark 4's built-in XML source; the writer escapes
    * markup-significant bytes, the reader parses back through the
    * explicit schema (no inference pass). */
  val fmXmlRoundtrip: Q = (s, d) => {
    val dir = tmpDir("fmxml") + "/orders_xml"
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        to_date(col("o_orderdate")).alias("od"))
      .write.mode("overwrite").format("xml")
      .option("rootTag", "orders").option("rowTag", "order")
      .save(dir)
    s.read.format("xml")
      .schema("o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE, od DATE")
      .option("rowTag", "order")
      .load(dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).alias("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long")).alias("price_cents"),
        date_format(min(col("od")), "yyyy-MM-dd").alias("first_date"),
        date_format(max(col("od")), "yyyy-MM-dd").alias("last_date"))
      .orderBy(col("o_orderpriority"))
  }

  /** FM7: schema evolution across file generations — generation 1 lands
    * without `o_orderpriority`, generation 2 adds it; `mergeSchema=true`
    * reconciles the footers into the union schema and generation-1 rows
    * surface the new column as NULL, defaulted with coalesce. This is
    * the reference's `windGust` probe (`bronze_to_silver.py:35-42`)
    * upgraded from one optional field to the general mechanism a lake
    * needs when producers add columns over time. At scale the footer
    * merge is a metadata operation (one footer per file), not a data
    * scan. */
  val fmSchemaMerge: Q = (s, d) => {
    val dir = tmpDir("fmevolve") + "/orders_gen"
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority"), year(col("o_orderdate")).alias("yr"))
    orders.filter(col("yr") < 1996)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(dir)
    orders.filter(col("yr") >= 1996)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode("append").parquet(dir)
    s.read.option("mergeSchema", "true").parquet(dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        coalesce(col("o_orderpriority"), lit("UNKNOWN")).alias("priority"))
      .groupBy(col("priority"))
      .agg(
        count(lit(1)).alias("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long")).alias("price_cents"))
      .orderBy(col("priority"))
  }

  /** FM8: corrupt-record quarantine — a JSON-lines feed where every
    * 7th record is invalid, read in PERMISSIVE mode with a declared
    * `_corrupt_record` column: bad lines land whole in the quarantine
    * column instead of killing the job (FAILFAST) or vanishing
    * (DROPMALFORMED). The aggregate books good rows per lang and the
    * corrupt count under its own bucket — at 100 TB a feed WILL contain
    * garbage, and row-level quarantine is the only shape that neither
    * stops the pipeline nor silently drops data. */
  val fmCorruptRecords: Q = (s, d) => {
    val dir = tmpDir("fmcorrupt") + "/docs_jsonl"
    Tables.documents(s, d)
      .select(
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit("{bad json line "), col("doc_id")))
          .otherwise(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))))
          .alias("value"))
      .write.mode("overwrite").text(dir)
    s.read
      .schema("doc_id BIGINT, lang STRING, n_chars BIGINT, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .groupBy(coalesce(col("lang"), lit("__CORRUPT__")).alias("lang_bucket"))
      .agg(
        count(lit(1)).alias("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).alias("total_chars"))
      .orderBy(col("lang_bucket"))
  }

  /** DT7: snapshot-isolated small-file compaction — commit events
    * scattered across 64 files (v0), apply a deletion-vector commit
    * (v1), then [[graft.ops.Bucketing.compactCommit]] rewrites the live
    * rows into ~1 file as v2, materializing the DVs away. The require()
    * makes the entry fail loudly if compaction ever stops shrinking the
    * file count; the returned aggregate proves the rewrite changed
    * nothing a reader can see. */
  val dtCompact: Q = (s, d) => {
    val table = Fixtures.table("fmcompact", d) { t =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").alias("value_cents"))
      graft.store.SnapshotStore.commit(ev.repartition(64), t)
      graft.store.SnapshotStore.deleteCommit(s, t, Seq("event_id"),
        pmod(col("event_id"), lit(10)) === 0)
      val (before, after, _, _) =
        graft.ops.Bucketing.compactCommit(s, t, targetBytes = 1L << 30)
      require(after < before, s"compaction did not shrink the file count: $before -> $after")
    }
    graft.store.SnapshotStore.read(s, table)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).alias("n_rows"),
        sum(col("value_cents")).alias("value_cents"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "fm_csv_roundtrip" -> fmCsvRoundtrip,
    "fm_orc_roundtrip" -> fmOrcRoundtrip,
    "fm_jsonl_roundtrip" -> fmJsonlRoundtrip,
    "fm_text_lines" -> fmTextLines,
    "fm_binary_files" -> fmBinaryFiles,
    "fm_xml_roundtrip" -> fmXmlRoundtrip,
    "fm_schema_merge" -> fmSchemaMerge,
    "fm_corrupt_records" -> fmCorruptRecords,
    "dt_compact" -> dtCompact
  )

  val oracles: Map[String, String] = Map(
    "fm_csv_roundtrip" ->
      """SELECT o_orderstatus, year(o_orderdate) AS yr,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
         FROM orders
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "fm_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "fm_jsonl_roundtrip" ->
      """SELECT c_mktsegment AS segment,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
                CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
         FROM customer
         GROUP BY 1 ORDER BY 1""",
    "fm_text_lines" ->
      """SELECT lang, source,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique
         FROM documents
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "fm_binary_files" ->
      """SELECT doc_id,
                CAST(strlen(text) AS BIGINT) AS n_bytes,
                md5(text) AS content_md5
         FROM documents
         WHERE doc_id < 8
         ORDER BY doc_id""",
    "fm_xml_roundtrip" ->
      """SELECT o_orderpriority,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
                strftime(min(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS first_date,
                strftime(max(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS last_date
         FROM orders
         GROUP BY 1 ORDER BY 1""",
    "fm_schema_merge" ->
      """SELECT CASE WHEN year(o_orderdate) >= 1996 THEN o_orderpriority
                     ELSE 'UNKNOWN' END AS priority,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
         FROM orders
         GROUP BY 1 ORDER BY 1""",
    "fm_corrupt_records" ->
      """SELECT CASE WHEN doc_id % 7 = 0 THEN '__CORRUPT__' ELSE lang END AS lang_bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(coalesce(sum(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END), 0)
                     AS BIGINT) AS total_chars
         FROM documents
         GROUP BY 1 ORDER BY 1""",
    "dt_compact" ->
      """SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events
         WHERE event_id % 10 <> 0
         GROUP BY 1 ORDER BY 1"""
  )
}
