package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs; sf0.001 fixtures (t1 smoke tier). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // session shared across suites
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = graft.core.Sessions.tune(
      SparkSession.builder().master("local[4]").appName("graft-test"), "4")
      // No-fallback gate (VERDICT r5 #2): a stage whose generated code
      // blows the JVM's 64 KB method limit normally falls back to
      // interpreted eval with only an ERROR log — invisible to tests
      // while silently de-optimizing the hottest stage (l7d round 5).
      // With fallback off, the compile failure propagates and the
      // operator's own smoke/spec test goes red instead.
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
