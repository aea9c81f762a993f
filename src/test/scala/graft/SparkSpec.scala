package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — Spark
  * startup is ~10s, tests reuse it).
  */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.build("4")
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val sf: String = "/root/testdata/sf0.001"
}
