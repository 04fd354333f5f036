package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions registration: the native expressions must be
  * callable from plain SQL in a session built with the extension.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("graft_dot and graft_hyperplane_sig are SQL-callable via extensions") {
    // getOrCreate would hand back the suite-shared session WITHOUT applying
    // extensions; clear the default so a fresh session (reusing the JVM's
    // SparkContext) is built with them, then restore for other suites.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // NOTE: the "spark.sql.extensions" CONF is only honored when the
    // SparkContext itself is created; on a pre-existing context (shared
    // test JVM) the programmatic withExtensions hook is the reliable path.
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(dot === 11.0)
      val sig = spark.sql(
        "SELECT graft_hyperplane_sig(array_repeat(1.0D, 64)) AS s")
        .collect().head.getLong(0)
      // 8 demo planes → signature fits in the low 8 bits; deterministic
      assert(sig >= 0 && sig < 256)
      val sig2 = spark.sql(
        "SELECT graft_hyperplane_sig(array_repeat(1.0D, 64)) AS s")
        .collect().head.getLong(0)
      assert(sig === sig2)
    } finally {
      // restore the suite-shared session; never stop the shared context.
      // If no session existed before, clear ours so later suites build
      // their own (instead of silently adopting the extension session).
      prior match {
        case Some(p) =>
          SparkSession.setDefaultSession(p)
          SparkSession.setActiveSession(p)
        case None =>
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
      }
    }
  }
}
