package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Config-driven function injection (`spark.sql.extensions`): the cluster
  * deployment path for the native expressions, vs the per-session
  * `GraftFunctions.register` used by library code.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftSparkExtensions injection registers native functions") {
    val orig = SparkTestSession.get // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions = the same injection path `spark.sql.extensions=
      // graft.GraftSparkExtensions` takes on a fresh cluster; the conf
      // string can't apply here because the test JVM's SparkContext
      // already exists (static conf)
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftSparkExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val cos = s.sql(
        "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) c")
        .head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val mh = s.sql(
        "SELECT size(graft_minhash(array('ab','bc','cd'), 16)) n")
        .head().getInt(0)
      assert(mh == 16)
      // injected functions survive newSession(); temp-function
      // registration would not
      val fresh = s.newSession()
      assert(fresh.sql("SELECT graft_cosine(array(1.0d), array(1.0d)) c")
        .head().getDouble(0) === 1.0)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
