package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared SparkSession fixture for all specs (one JVM-wide session). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  // local[8]: the JVM-wide SparkContext is created by whichever suite runs
  // first and its core count caps EVERY suite (sessions built later reuse
  // it whatever master they ask for) — 8 keeps the registry smoke spec and
  // the data-heavier specs parallel without oversubscribing the test box
  // withExtensions (not the conf): the conf is only honored at
  // SparkContext creation, and suite ordering makes that nondeterministic
  // in the test JVM. The shared fixture carries the SAME extensions as the
  // production session (GraftSession), so specs exercise the planner the
  // way gates see it — incl. the CowRowLevelRewrite UPDATE/MERGE routing.
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    .withExtensions(new GraftExtensions())
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
