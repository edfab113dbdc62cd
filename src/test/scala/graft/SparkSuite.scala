package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (built through
  * [[graft.Sessions]] so session flags match production). */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSuite.shared

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkSuite {
  lazy val shared: SparkSession = Sessions.local("graft-test")
}
