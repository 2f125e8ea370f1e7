package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Sessions

/** One lazy SparkSession per suite; sf0.001 fixtures for speed. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.configure(
    SparkSession.builder().master("local[4]"), 4).getOrCreate()
  val sfDir = "/root/testdata/sf0.001"
}
