package graft

/** Corpus-wide smoke guard (r8 post-mortem).
  *
  * Round 8 shipped with 35 declared queries failing analysis because the
  * driver regenerated the test data with a different physical type for
  * `events.ts` — and nothing in `sbt test` exercised every declared entry
  * against the data, so the drift surfaced only at round end. This suite
  * closes that hole: every `SparkEntry.queries` entry must build, analyze
  * AND fully execute on the sf0.001 smoke data. Execution uses the noop
  * sink so all columns of every row are materialized (a bare `count()`
  * lets Catalyst prune projections and would miss runtime errors inside
  * column expressions).
  *
  * One test per query (registered dynamically) so a failure names the
  * broken entry directly in the test report.
  */
class SmokeSpec extends SparkSuite {

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"smoke: $name executes on sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf())
      df.queryExecution.assertAnalyzed()
      df.write.mode("overwrite").format("noop").save()
    }
  }
}
