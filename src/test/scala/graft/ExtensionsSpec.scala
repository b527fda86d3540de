package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session built with graft.GraftExtensions resolves graft_* in plain SQL
  * with no manual registration.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extension-injected functions resolve in SQL") {
    // getOrCreate would hand back the shared test session (no extensions);
    // clear default/active first, restore after.
    val previous = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // .config("spark.sql.extensions", ...) only takes effect when the
    // SparkContext is created; with the shared test context use the
    // programmatic form (same injection path).
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT graft_dot(array(CAST(1.0 AS DOUBLE), 2.0), array(CAST(3.0 AS DOUBLE), 4.0)) AS d")
        .collect().head.getDouble(0)
      assert(dot == 11.0)
      val sh = spark.sql(
        "SELECT graft_shingle_hashes(array('a','b','c'), 2, true) AS h")
        .collect().head.getSeq[Long](0)
      assert(sh.length == 2 && sh.forall(h => h >= 0 && h < 2147483647L))
      val sig = spark.sql("SELECT graft_minhash(array(CAST(5 AS BIGINT), 9), 4) AS s")
        .collect().head.getSeq[Long](0)
      assert(sig.length == 4)
    } finally {
      // don't stop the shared SparkContext; just restore the previous session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      previous.foreach(SparkSession.setDefaultSession)
    }
  }
}
