package graft.tools

import graft.{Sessions, SparkEntry}

/** Prints formatted physical plans for representative queries so the
  * pushdown/broadcast/codegen properties can be audited (dev tool). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-plan-audit")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("s2_scan", "a1_agg", "j1_multikey_join", "j5_fact_dim", "j4_band_join", "w3_pct_of_total")
    names.foreach { n =>
      println(s"########## $n ##########")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
