package graft.sql

import graft.SparkSuite
import graft.queries.ModernSqlQueries

/** Properties of the modern-SQL battery the oracle compare can't see:
  * recursion really executes as UnionLoop (not an unrolled plan), SQL
  * UDFs inline into codegen with no UDF node left, the table function's
  * body predicate reaches the parquet scan, pipe syntax produces the
  * same plan as the standard spelling, and the unsupported recursion
  * form fails loudly. Values are covered by the ms_* oracle entries. */
class ModernSqlSpec extends SparkSuite {

  test("ms1/ms2: recursive CTEs execute as UnionLoop with bounded depth") {
    val df = ModernSqlQueries.ms1RecursiveChain(spark, sf())
    assert(df.queryExecution.executedPlan.toString.contains("UnionLoop"),
      "recursive chain did not plan as UnionLoopExec")
    // depth is log2-bounded by the key domain, not the row count
    val maxDepth = df.collect().map(_.getLong(1)).max
    assert(maxDepth <= 9, s"chain depth $maxDepth exceeds log2(400)")

    val paths = ModernSqlQueries.ms2RecursivePaths(spark, sf()).collect()
    // Padovan-style recurrence p(n) = p(n-2) + p(n-3), p(0)=1: closed-form
    // check of the path counts the recursion enumerated
    val byNode = paths.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expect = Array.fill(25)(0L)
    expect(0) = 1
    for (n <- 2 to 24)
      expect(n) = (if (n >= 2) expect(n - 2) else 0L) + (if (n >= 3) expect(n - 3) else 0L)
    for (n <- 0 to 24 if expect(n) > 0)
      assert(byNode.get(n).contains(expect(n)), s"node $n: ${byNode.get(n)} != ${expect(n)}")
  }

  test("ms2: UNION (dedup) recursion is rejected, UNION ALL is the contract") {
    ModernSqlQueries.ms2RecursivePaths(spark, sf()) // registers graft_ms_edges
    val e = intercept[Exception] {
      spark.sql(
        """WITH RECURSIVE reach(node) AS (
             SELECT 0 UNION SELECT e.dst FROM reach r JOIN graft_ms_edges e ON e.src = r.node)
           SELECT count(*) FROM reach""").collect()
    }
    assert(e.getMessage.contains("UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"),
      s"expected the documented UNION rejection, got: ${e.getMessage.take(200)}")
  }

  test("ms3: SQL UDFs inline — no UDF node, arithmetic inside codegen") {
    val df = ModernSqlQueries.ms3SqlUdf(spark, sf())
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_disc_price") && !optimized.contains("graft_charge"),
      s"SQL function survived into the optimized plan:\n$optimized")
    df.collect() // finalize the AQE plan so codegen stages are visible
    val physical = df.queryExecution.executedPlan.toString
    // "*(n) HashAggregate" markers = whole-stage-codegen'd stages carrying
    // the inlined arithmetic
    assert(physical.contains("*(1)"),
      s"inlined arithmetic not under whole-stage codegen:\n$physical")
  }

  test("ms4: table-function body predicate reaches the parquet scan") {
    val df = ModernSqlQueries.ms4SqlTableFn(spark, sf())
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("o_totalprice"),
      s"threshold predicate not pushed into the scan:\n$physical")
    assert(df.count() > 0, "table function returned no rows at sf0.001")
  }

  test("ms5: collation answers match the lower() rewrite") {
    val r = ModernSqlQueries.ms5Collation(spark, sf()).collect()(0)
    assert(r.getLong(0) == 5, s"case-insensitive distinct: ${r.getLong(0)}")
    assert(r.getLong(1) == 10, s"binary distinct should see both case images: ${r.getLong(1)}")
    assert(r.getLong(2) > 0 && r.getLong(3) > 0, "collated equality/prefix matched nothing")
  }

  test("ms7: parameterized SQL binds as literals; EXECUTE IMMEDIATE agrees") {
    val df = ModernSqlQueries.ms7ParamSql(spark, sf())
    // bound parameters behave exactly like hand-written constants: the
    // timestamp range lands in the scan as a pushed filter
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("o_orderdate"),
      s"bound range predicate not pushed into the scan:\n$physical")
    val viaExec = spark.sql(
      """EXECUTE IMMEDIATE
           'SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM graft_ms_orders
            WHERE o_orderdate >= CAST(? AS TIMESTAMP) AND o_orderdate < CAST(? AS TIMESTAMP)
            GROUP BY o_orderpriority ORDER BY o_orderpriority'
         USING '1995-01-01', '1996-01-01'""")
    assert(df.collect().toSeq == viaExec.collect().toSeq,
      "EXECUTE IMMEDIATE result diverged from the parameterized query")
  }

  test("ms6: pipe syntax plans identically to the standard spelling") {
    val pipe = ModernSqlQueries.ms6PipeSql(spark, sf())
    val std = spark.sql(
      """SELECT l_returnflag, l_linestatus,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(l_quantity), 2) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
         FROM graft_ms_lineitem
         WHERE l_shipdate < TIMESTAMP '1995-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""")
    // the pipe EXTEND stages the derived column in its own Project, so
    // exact plan equality is too strict; what matters at scale is the
    // same shuffle count (one partial+final aggregate pair) and the
    // filter still reaching the scan
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(exchanges(pipe) == exchanges(std),
      "pipe spelling added a shuffle over the standard plan")
    val physical = pipe.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("l_shipdate"),
      s"pipe WHERE not pushed into the scan:\n$physical")
    assert(pipe.collect().toSeq == std.collect().toSeq)
  }

  test("ms9/ms10: variant semantics — try extraction nulls on drift/mismatch, strict throws") {
    // absent path: null through try_variant_get (the schema-drift read)
    assert(spark.sql(
      "SELECT try_variant_get(parse_json('{}'), '$.missing', 'string')").head.isNullAt(0))
    // type mismatch: try → null, strict variant_get → error
    assert(spark.sql(
      """SELECT try_variant_get(parse_json('{"a": "x"}'), '$.a', 'int')""").head.isNullAt(0))
    intercept[Exception](spark.sql(
      """SELECT variant_get(parse_json('{"a": "x"}'), '$.a', 'int')""").collect())
    // numbers extract losslessly at their JSON width
    assert(spark.sql(
      """SELECT variant_get(parse_json('{"k": 9007199254740993}'), '$.k', 'long')""")
      .head.getLong(0) === 9007199254740993L)
    // schema_of_variant sees the union shape of a nested payload
    val sch = spark.sql(
      """SELECT schema_of_variant(parse_json('{"a": 1, "b": [1.5]}'))""").head.getString(0)
    assert(sch.toUpperCase.contains("OBJECT<") && sch.toUpperCase.contains("ARRAY<"),
      s"unexpected variant schema: $sch")
  }

  test("ms11: SQL scripting — variables, IF, WHILE; last statement is the result") {
    val rows = ModernSqlQueries.ms11SqlScripting(spark, sf()).collect()
    assert(rows.nonEmpty)
    // the IF branch and the WHILE accumulation both fold into the output
    rows.foreach { r =>
      assert(r.getString(r.fieldIndex("branch")) === "priced")
      assert(r.getLong(r.fieldIndex("loop_sum")) === 10L) // 0+1+2+3+4
    }
    // the script's data flow agrees with the plain-SQL spelling
    graft.sources.Tables.orders(spark, sf()).createOrReplaceTempView("graft_ms11_orders")
    val plain = spark.sql(
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
         FROM graft_ms11_orders
         WHERE CAST(round(o_totalprice * 100) AS BIGINT) >
               (SELECT CAST(round(avg(o_totalprice) * 100) AS BIGINT) FROM graft_ms11_orders)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq
      === plain.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }
}
