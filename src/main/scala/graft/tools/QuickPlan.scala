package graft.tools

/** One-off plan printer: `runMain graft.tools.QuickPlan <query> <sfDir>`. */
object QuickPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("plan-audit")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    println("=== PLAN " + args(0))
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
