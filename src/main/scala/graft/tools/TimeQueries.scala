package graft.tools

/** Per-query wall-clock for an explicit subset — the scale-ladder dev
  * loop (`runMain graft.tools.TimeQueries <sfDir> <name,name,...>`):
  * times each named `SparkEntry.queries` entry with the same
  * count-the-result action the bench uses, one line per query. Use for
  * sf0.1 → sf1 scaling measurements without paying for the whole
  * corpus. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = (args(0), args(1).split(",").toSeq)
    val spark = graft.Sessions.local("graft-timeq")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQ $name%-24s $sec%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
