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

  test("optimizer rule strips broadcast hints from oversized sides, keeps dim-sized ones") {
    import org.apache.spark.sql.functions._
    val previous = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-dehint-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // default threshold 10 MB, margin 4x → cap 40 MB.
      val fact = spark.range(0, 20000000L).toDF("id")          // ~160 MB estimated
      val oversized = spark.range(0, 10000000L).toDF("id")     // ~80 MB estimated
      val dim = spark.range(0, 1000L).toDF("id")               // tiny
      val bad = fact.join(broadcast(oversized), "id")
      val good = fact.join(broadcast(dim), "id")
      val badPlan = bad.queryExecution.executedPlan.toString
      val goodPlan = good.queryExecution.executedPlan.toString
      assert(!badPlan.contains("BroadcastHashJoin"),
        s"oversized hint must be stripped:\n$badPlan")
      assert(goodPlan.contains("BroadcastHashJoin"),
        s"dim-sized hint must survive:\n$goodPlan")
      // semantics unchanged: the de-hinted join still computes the overlap
      assert(fact.join(broadcast(spark.range(0, 10000000L).toDF("id")), "id")
        .filter(col("id") < 3).count() == 3)

      // a deliberate broadcast of a side with UNKNOWN statistics must
      // survive: RDD-backed plans (like DSv2 sources without
      // SupportsReportStatistics) report the defaultSizeInBytes sentinel,
      // which is "no estimate", not "oversized"
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val unknownStats = spark.createDataFrame(
        spark.sparkContext.parallelize((0L until 100L).map(Row(_))),
        StructType(Seq(StructField("id", LongType))))
      val hinted = fact.join(broadcast(unknownStats), "id")
      val hintedPlan = hinted.queryExecution.executedPlan.toString
      assert(hintedPlan.contains("BroadcastHashJoin"),
        s"stats-unknown deliberate broadcast must be honored:\n$hintedPlan")
      // a PROJECTED stats-unknown side scales the sentinel down (Project
      // estimation multiplies by outputRow/childRow), but the estimate is
      // still meaningless — the leaf test must keep the hint
      import org.apache.spark.sql.types.StringType
      val wide = spark.createDataFrame(
        spark.sparkContext.parallelize((0L until 100L).map(i => Row(i, i.toString, i.toString))),
        StructType(Seq(StructField("id", LongType),
          StructField("pad1", StringType), StructField("pad2", StringType))))
      val projected = fact.join(broadcast(wide.select("id")), "id")
      val projectedPlan = projected.queryExecution.executedPlan.toString
      assert(projectedPlan.contains("BroadcastHashJoin"),
        s"projected stats-unknown deliberate broadcast must be honored:\n$projectedPlan")

      // a deployment that LOWERS defaultSizeInBytes must not disable the
      // OOM guard: known leaf sizes above the (now small) sentinel are
      // real estimates, not "unknown" — the sentinel test is equality
      spark.conf.set("spark.sql.defaultSizeInBytes", "1024")
      try {
        val loweredPlan = fact.join(broadcast(spark.range(0, 10000000L).toDF("id")), "id")
          .queryExecution.executedPlan.toString
        assert(!loweredPlan.contains("BroadcastHashJoin"),
          s"guard must keep stripping when defaultSizeInBytes is lowered:\n$loweredPlan")
      } finally spark.conf.unset("spark.sql.defaultSizeInBytes")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      previous.foreach(SparkSession.setDefaultSession)
    }
  }
}
