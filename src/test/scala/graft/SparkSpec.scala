package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, sequential suites). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  /** Absolute path of a test resource (kept on disk by sbt). */
  def res(name: String): String = getClass.getResource("/" + name).getPath
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.build("4")
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
