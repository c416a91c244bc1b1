package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared fixture: one GraftSession for the whole JVM (the same
  * AQE-enabled config Verify/Bench use — tests must not drift from the
  * shipped session), sf0.001 data for speed.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local(4)
}
