package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Modern SQL-surface battery: recursive CTEs, SQL-defined (declarative)
  * functions, collation-aware comparisons, and SQL pipe syntax — the
  * Spark 4.x engine features a reference user migrating from a warehouse
  * stack (Athena/Glue, reference `sample_queries.sql`) would expect a
  * complete engine to carry.
  *
  * Scale notes (100 TB):
  *  - Recursive CTEs execute as [[org.apache.spark.sql.execution.UnionLoopExec]]:
  *    the driver orchestrates ITERATIONS, but every iteration body is a
  *    fully distributed plan (join + shuffle against the previous step's
  *    frontier). Depth here is bounded by construction (log2 of the key
  *    domain for ms1, the longest DAG path for ms2), far under
  *    `spark.sql.cteRecursionLevelLimit` (100) — no unbounded driver loop.
  *  - SQL UDFs are INLINED by `ResolveSQLFunctions` at analysis time: the
  *    optimized plan carries the raw arithmetic inside whole-stage codegen,
  *    so a library of business-logic functions costs nothing vs hand-written
  *    expressions (ModernSqlSpec pins both properties).
  *  - SQL table functions likewise inline their body, so predicates inside
  *    the function body reach the parquet scan as pushed filters
  *    (ModernSqlSpec asserts the PushedFilters list).
  *  - Collation comparisons (UTF8_LCASE) evaluate per-row inside codegen;
  *    count(DISTINCT collate(...)) shuffles the collation sort key exactly
  *    like any distinct — no extra pass over the corpus vs a lower() copy,
  *    and no second materialized column.
  *
  * Oracle convention (SURVEY §2.12): exact integer sub-unit sums with an
  * OUTER `CAST(sum(...) AS BIGINT)` — DuckDB widens sum(BIGINT) to
  * HUGEINT which pandas renders float64 and can never hash-match Spark's
  * int64 (the r9 dt_* lesson). Collation oracles replay as lower();
  * recursive oracles replay as DuckDB's own WITH RECURSIVE; pipe-syntax
  * oracles replay as standard SQL.
  */
object ModernSqlQueries {

  type Q = (SparkSession, String) => DataFrame

  /** ms1: recursive CTE — halving parent chain per customer key.
    * Each customer key's chain node -> node DIV 2 terminates at <=1, so
    * recursion depth is ceil(log2(max key)) regardless of row count: at
    * 100 TB the iteration count is ~40 while each iteration stays a
    * narrow distributed map over the surviving frontier. */
  val ms1RecursiveChain: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_ms_customer")
    s.sql(
      """WITH RECURSIVE chain(custkey, node, depth) AS (
           SELECT c_custkey, c_custkey, 0 FROM graft_ms_customer WHERE c_custkey <= 400
           UNION ALL
           SELECT custkey, node DIV 2, depth + 1 FROM chain WHERE node > 1
         )
         SELECT custkey,
                CAST(max(depth) AS BIGINT) AS depth,
                CAST(sum(node) AS BIGINT) AS chain_sum
         FROM chain GROUP BY custkey ORDER BY custkey""")
  }

  /** ms2: recursive CTE with a distributed join per step — DAG path
    * counting over nation-derived edges (i -> i+2, i -> i+3). UNION ALL
    * recursion enumerates every path exactly once (the DAG bounds the
    * frontier); the closing GROUP BY turns path multiset into counts.
    * Spark rejects UNION (dedup) recursion — the ALL form is the
    * supported contract, pinned in ModernSqlSpec. */
  val ms2RecursivePaths: Q = (s, d) => {
    Tables.nation(s, d).createOrReplaceTempView("graft_ms_nation")
    s.sql(
      """CREATE OR REPLACE TEMPORARY VIEW graft_ms_edges AS
         SELECT n_nationkey AS src, n_nationkey + 2 AS dst
         FROM graft_ms_nation WHERE n_nationkey + 2 <= 24
         UNION ALL
         SELECT n_nationkey, n_nationkey + 3
         FROM graft_ms_nation WHERE n_nationkey + 3 <= 24""")
    s.sql(
      """WITH RECURSIVE reach(node) AS (
           SELECT 0
           UNION ALL
           SELECT e.dst FROM reach r JOIN graft_ms_edges e ON e.src = r.node
         )
         SELECT CAST(node AS INT) AS node, CAST(count(*) AS BIGINT) AS n_paths
         FROM reach GROUP BY node ORDER BY node""")
  }

  /** ms3: SQL-defined scalar functions (CREATE FUNCTION ... RETURN expr),
    * one nesting the other, used inside exact integer-unit aggregates.
    * The analyzer inlines both bodies, so the oracle is simply the same
    * arithmetic written out — proving the declarative-function surface
    * costs nothing vs hand-inlined expressions. */
  val ms3SqlUdf: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_ms_lineitem")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(ep DOUBLE, disc DOUBLE)
         RETURNS DOUBLE RETURN ep * (1.0 - disc)""")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_charge(ep DOUBLE, disc DOUBLE, tax DOUBLE)
         RETURNS DOUBLE RETURN graft_disc_price(ep, disc) * (1.0 + tax)""")
    s.sql(
      """SELECT l_returnflag,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(graft_disc_price(l_extendedprice, l_discount) * 10000) AS BIGINT)) AS BIGINT) AS disc_e4,
                CAST(sum(CAST(round(graft_charge(l_extendedprice, l_discount, l_tax) * 1000000) AS BIGINT)) AS BIGINT) AS charge_e6
         FROM graft_ms_lineitem
         GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  /** ms4: SQL table function — a parameterized relation. The body inlines
    * at invocation, so the `o_totalprice > threshold` predicate lands in
    * the parquet scan's PushedFilters (asserted in ModernSqlSpec): a
    * 100 TB invocation reads only the qualifying row groups. */
  val ms4SqlTableFn: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("graft_ms_orders")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_orders_above(threshold DOUBLE)
         RETURNS TABLE(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
         RETURN SELECT o_orderkey, o_custkey, o_totalprice
                FROM graft_ms_orders WHERE o_totalprice > threshold""")
    s.sql(
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
         FROM graft_orders_above(450000.0D) ORDER BY o_orderkey""")
  }

  /** ms5: collation-aware comparison (UTF8_LCASE) over a deterministically
    * case-mangled segment column: distinct-count, equality, and prefix
    * match all case-insensitive without materializing a lower() copy.
    * The oracle IS the lower() rewrite — same answers, one copy more. */
  val ms5Collation: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_ms_customer")
    s.sql(
      """WITH t AS (
           SELECT c_custkey,
                  CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                       ELSE lower(c_mktsegment) END AS seg
           FROM graft_ms_customer)
         SELECT CAST(count(DISTINCT collate(seg, 'UTF8_LCASE')) AS BIGINT) AS n_ci,
                CAST(count(DISTINCT seg) AS BIGINT) AS n_cs,
                CAST(count(CASE WHEN collate(seg, 'UTF8_LCASE') = 'building' THEN 1 END) AS BIGINT) AS n_building,
                CAST(count(CASE WHEN startswith(collate(seg, 'UTF8_LCASE'), 'HOUSE') THEN 1 END) AS BIGINT) AS n_house
         FROM t""")
  }

  /** ms6: SQL pipe syntax — the linear dataflow spelling of a pricing
    * summary (filter -> derive -> aggregate -> order). Parses to exactly
    * the plan the standard-SQL spelling produces (ModernSqlSpec compares
    * optimized plans), so the surface is free. */
  val ms6PipeSql: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_ms_lineitem")
    s.sql(
      """FROM graft_ms_lineitem
         |> WHERE l_shipdate < TIMESTAMP '1995-09-02 00:00:00'
         |> EXTEND CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT) AS disc_e4
         |> AGGREGATE CAST(count(*) AS BIGINT) AS n,
                      round(sum(l_quantity), 2) AS sum_qty,
                      CAST(sum(disc_e4) AS BIGINT) AS revenue_e4
            GROUP BY l_returnflag, l_linestatus
         |> ORDER BY l_returnflag, l_linestatus""")
  }

  /** ms7: parameterized SQL (named markers, injection-safe by
    * construction) with an IDENTIFIER() dynamic table reference — the
    * templated-job surface (Glue job arguments in the reference,
    * `weather-etl-job.py:23-27`) without string splicing. Parameters bind
    * as literals at analysis, so pushdown/pruning see the bound values
    * exactly like hand-written constants. EXECUTE IMMEDIATE parity is
    * pinned in ModernSqlSpec. */
  val ms7ParamSql: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("graft_ms_orders")
    s.sql(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
         FROM IDENTIFIER(:tbl)
         WHERE o_orderdate >= CAST(:lo AS TIMESTAMP) AND o_orderdate < CAST(:hi AS TIMESTAMP)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
      Map("tbl" -> "graft_ms_orders", "lo" -> "1995-01-01", "hi" -> "1996-01-01"))
  }

  /** ms8: SQL ergonomics — LATERAL COLUMN ALIASES (a SELECT item
    * referencing a sibling alias, resolved left-to-right by the
    * analyzer — no subquery nesting needed) and `ORDER BY ALL`
    * (DuckDB-originated shorthand Spark 4 adopted). Both resolve to the
    * exact plan the explicit spelling produces; the oracle is DuckDB's
    * native form of the same features. */
  val ms8LateralAlias: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_ms_lineitem")
    s.sql(
      """SELECT l_orderkey, l_linenumber,
                round(l_extendedprice * (1.0 - l_discount), 4) AS disc_price,
                round(disc_price * (1.0 + l_tax), 6) AS charge
         FROM graft_ms_lineitem
         WHERE l_orderkey < 200
         ORDER BY ALL""")
  }

  /** ms9: VARIANT — Spark 4's open semi-structured type end-to-end:
    * JSON text parses once into the binary variant encoding
    * (`parse_json`), typed paths extract with `variant_get`, and
    * schema DRIFT (a key present on only some rows — `to_json` drops
    * null fields, so a third of the payloads genuinely lack `note`)
    * reads as null through `try_variant_get` instead of failing.
    * At 100 TB this is the ingest shape for heterogeneous crawl/event
    * payloads: ONE binary column, no schema migration per new key,
    * columnar-shredded access per query. The oracle replays the same
    * aggregate from the ground-truth columns — the JSON→variant→typed
    * round trip must be lossless. */
  val ms9Variant: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("graft_ms9_orders")
    s.sql(
      """WITH payloads AS (
           SELECT parse_json(to_json(named_struct(
                    'key', o_orderkey,
                    'prio', o_orderpriority,
                    'price', o_totalprice,
                    'note', CASE WHEN o_orderkey % 3 = 0
                                 THEN concat('n', o_orderkey) END))) AS v
           FROM graft_ms9_orders)
         SELECT variant_get(v, '$.prio', 'string') AS prio,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(variant_get(v, '$.price', 'double') * 100) AS BIGINT)) AS BIGINT) AS cents,
                CAST(count(try_variant_get(v, '$.note', 'string')) AS BIGINT) AS n_notes
         FROM payloads
         GROUP BY prio
         ORDER BY prio""")
  }

  /** ms10: VARIANT arrays — a nested JSON ARRAY per order (its line
    * items) lands in ONE variant cell; `variant_explode` (Spark 4
    * table function) re-flattens it lazily per query. The 100 TB
    * point: nested repeated payloads need no second normalized table
    * or schema'd array column — explode happens post-scan inside the
    * distributed plan, and only queries that ask for the nesting pay
    * for it. Oracle replays the flatten from the normalized table. */
  val ms10VariantExplode: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_ms10_lineitem")
    s.sql(
      """WITH docs AS (
           SELECT l_orderkey,
                  parse_json(to_json(collect_list(named_struct(
                    'qty', l_quantity, 'ep', l_extendedprice)))) AS items
           FROM graft_ms10_lineitem
           WHERE l_orderkey < 1000
           GROUP BY l_orderkey)
         SELECT CAST(count(*) AS BIGINT) AS n_items,
                CAST(sum(CAST(variant_get(item.value, '$.qty', 'double') AS BIGINT)) AS BIGINT) AS qty,
                CAST(sum(CAST(round(variant_get(item.value, '$.ep', 'double') * 100) AS BIGINT)) AS BIGINT) AS ep_cents
         FROM docs, LATERAL variant_explode(items) AS item""")
  }

  /** ms11: SQL SCRIPTING (Spark 4 `BEGIN ... END` compounds) — session
    * variables (`DECLARE`/`SET`), branching (`IF`), and a bounded
    * `WHILE` loop, with the compound's LAST statement as the script's
    * result set. The control flow runs on the DRIVER between fully
    * distributed statements — the loop below is 5 scalar SET steps, so
    * at 100 TB the script costs exactly its data statements (here: one
    * scalar aggregate + one grouped aggregate over orders), never a
    * per-row driver loop. The oracle replays the data flow as plain
    * SQL with the control-flow results folded to literals. */
  val ms11SqlScripting: Q = (s, d) => {
    // restore rather than blanket-unset so the query never clobbers a
    // user session that had scripting on already
    val prior = s.conf.getOption("spark.sql.scripting.enabled")
    s.conf.set("spark.sql.scripting.enabled", "true")
    Tables.orders(s, d).createOrReplaceTempView("graft_ms11_orders")
    try s.sql(
      """BEGIN
           DECLARE avg_cents BIGINT DEFAULT 0;
           DECLARE branch STRING DEFAULT 'unset';
           DECLARE i INT DEFAULT 0;
           DECLARE loop_sum BIGINT DEFAULT 0;
           SET avg_cents = (SELECT CAST(round(avg(o_totalprice) * 100) AS BIGINT)
                            FROM graft_ms11_orders);
           IF avg_cents > 0 THEN
             SET branch = 'priced';
           ELSE
             SET branch = 'empty';
           END IF;
           WHILE i < 5 DO
             SET loop_sum = loop_sum + i;
             SET i = i + 1;
           END WHILE;
           SELECT o_orderstatus,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
                  branch AS branch,
                  CAST(loop_sum AS BIGINT) AS loop_sum
           FROM graft_ms11_orders
           WHERE CAST(round(o_totalprice * 100) AS BIGINT) > avg_cents
           GROUP BY o_orderstatus, branch, loop_sum
           ORDER BY o_orderstatus;
         END""")
    finally prior match {
      case Some(v) => s.conf.set("spark.sql.scripting.enabled", v)
      case None    => s.conf.unset("spark.sql.scripting.enabled")
    }
  }

  val queries: Map[String, Q] = Map(
    "ms9_variant"         -> ms9Variant,
    "ms11_sql_scripting"  -> ms11SqlScripting,
    "ms10_variant_explode" -> ms10VariantExplode,
    "ms1_recursive_chain" -> ms1RecursiveChain,
    "ms2_recursive_paths" -> ms2RecursivePaths,
    "ms3_sql_udf"         -> ms3SqlUdf,
    "ms4_sql_table_fn"    -> ms4SqlTableFn,
    "ms5_collation"       -> ms5Collation,
    "ms6_pipe_sql"        -> ms6PipeSql,
    "ms7_param_sql"       -> ms7ParamSql,
    "ms8_lateral_alias"   -> ms8LateralAlias)

  val oracles: Map[String, String] = Map(
    "ms11_sql_scripting" ->
      """SELECT o_orderstatus,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
                'priced' AS branch,
                CAST(10 AS BIGINT) AS loop_sum
         FROM orders
         WHERE CAST(round(o_totalprice * 100) AS BIGINT) >
               (SELECT CAST(round(avg(o_totalprice) * 100) AS BIGINT) FROM orders)
         GROUP BY o_orderstatus
         ORDER BY o_orderstatus""",
    "ms9_variant" ->
      """SELECT o_orderpriority AS prio,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
                CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_notes
         FROM orders
         GROUP BY prio
         ORDER BY prio""",
    "ms10_variant_explode" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_items,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ep_cents
         FROM lineitem
         WHERE l_orderkey < 1000""",
    "ms1_recursive_chain" ->
      """WITH RECURSIVE chain(custkey, node, depth) AS (
           SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey <= 400
           UNION ALL
           SELECT custkey, node // 2, depth + 1 FROM chain WHERE node > 1
         )
         SELECT custkey,
                CAST(max(depth) AS BIGINT) AS depth,
                CAST(sum(node) AS BIGINT) AS chain_sum
         FROM chain GROUP BY custkey ORDER BY custkey""",
    "ms2_recursive_paths" ->
      """WITH RECURSIVE edges AS (
           SELECT n_nationkey AS src, n_nationkey + 2 AS dst
           FROM nation WHERE n_nationkey + 2 <= 24
           UNION ALL
           SELECT n_nationkey, n_nationkey + 3
           FROM nation WHERE n_nationkey + 3 <= 24),
         reach(node) AS (
           SELECT 0
           UNION ALL
           SELECT e.dst FROM reach r JOIN edges e ON e.src = r.node
         )
         SELECT CAST(node AS INT) AS node, CAST(count(*) AS BIGINT) AS n_paths
         FROM reach GROUP BY node ORDER BY node""",
    "ms3_sql_udf" ->
      """SELECT l_returnflag,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS disc_e4,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000) AS BIGINT)) AS BIGINT) AS charge_e6
         FROM lineitem
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "ms4_sql_table_fn" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
         FROM orders WHERE o_totalprice > 450000.0 ORDER BY o_orderkey""",
    "ms5_collation" ->
      """WITH t AS (
           SELECT c_custkey,
                  CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                       ELSE lower(c_mktsegment) END AS seg
           FROM customer)
         SELECT CAST(count(DISTINCT lower(seg)) AS BIGINT) AS n_ci,
                CAST(count(DISTINCT seg) AS BIGINT) AS n_cs,
                CAST(count(CASE WHEN lower(seg) = 'building' THEN 1 END) AS BIGINT) AS n_building,
                CAST(count(CASE WHEN lower(seg) LIKE 'house%' THEN 1 END) AS BIGINT) AS n_house
         FROM t""",
    "ms6_pipe_sql" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(l_quantity), 2) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
         FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1995-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "ms7_param_sql" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "ms8_lateral_alias" ->
      """SELECT l_orderkey, l_linenumber,
                round(l_extendedprice * (1.0 - l_discount), 4) AS disc_price,
                round(disc_price * (1.0 + l_tax), 6) AS charge
         FROM lineitem
         WHERE l_orderkey < 200
         ORDER BY ALL""")
}
