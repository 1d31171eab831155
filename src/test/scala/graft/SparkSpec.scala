package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs: one per suite, graft defaults. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(cores = 4)
  lazy val sf: String = "/root/testdata/sf0.001"
}
