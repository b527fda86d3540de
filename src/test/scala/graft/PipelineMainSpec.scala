package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.stages.PipelineMain

/** The spark-submit packaging (S8): each stage a separate invocation
  * sharing only durable MergeTable storage — the per-task contract of the
  * Airflow DAG (`tools/airflow_dag_graft.py`). Asserts cross-JVM-shaped
  * restartability (state lives in storage, not the session), SCD
  * semantics across two days, replay idempotence, and the ledger mart.
  */
class PipelineMainSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def ts(s: String) = Timestamp.valueOf(s)

  private def delivery(id: String, order: String, courier: String,
                       dts: String, rate: Int, sum: String, tip: String): (String, Timestamp) =
    (s"""{"order_id":"$order","order_ts":"$dts","delivery_id":"$id","courier_id":"$courier",""" +
      s""""address":"a","delivery_ts":"$dts","rate":$rate,"sum":$sum,"tip_sum":$tip}""",
      ts(dts))

  private def writeSource(dir: String, couriers: Seq[(String, String)],
                          deliveries: Seq[(String, Timestamp)]): Unit = {
    import spark.implicits._
    couriers.toDF("courier_key", "courier_name")
      .write.mode("overwrite").parquet(s"$dir/couriers")
    deliveries.toDF("json_response", "delivery_ts")
      .write.mode("overwrite").parquet(s"$dir/deliveries")
  }

  private def ledgerOf(wh: String): Map[String, org.apache.spark.sql.Row] = {
    val dir = s"$wh/cdm/ledger"
    spark.read.parquet(s"$dir/${new graft.stages.MergeTable(dir, Seq.empty).currentVersion.get}")
      .collect().map(r => r.getAs[String]("courier_name") -> r).toMap
  }

  test("malformed payload lands under a surrogate key, quarantines with reason, replays clean") {
    import spark.implicits._
    val wh = graft.stages.TempDirs.scratch("graft_pm_mal_wh_")
    val src = graft.stages.TempDirs.scratch("graft_pm_mal_src_")
    PipelineMain.seedOrders(spark, wh,
      Seq(("o1", 11, 1)).toDF("order_key", "id", "timestamp_id"))
    // one clean row + one payload with no delivery_id at all
    writeSource(src, Seq("c1" -> "Ann"), Seq(
      delivery("d1", "o1", "c1", "2024-05-01 11:00:00", 5, "100.00", "10.00"),
      ("""{"order_id":"o1","courier_id":"c1","rate":5,"sum":"1.00","tip_sum":"0.00"}""",
        ts("2024-05-01 13:00:00"))))
    Seq("load_stg", "stg_to_dds").foreach(PipelineMain.runStage(spark, _, wh, Some(src)))

    def table(rel: String): org.apache.spark.sql.DataFrame = {
      val mt = new graft.stages.MergeTable(s"$wh/$rel", Seq.empty)
      spark.read.parquet(s"$wh/$rel/${mt.currentVersion.get}")
    }
    // the malformed row LANDED (surrogate key), was not collapsed or lost
    assert(table("stg/deliveries").count() == 2)
    assert(table("stg/deliveries")
      .filter(col("delivery_key").startsWith("_malformed_")).count() == 1)
    // and was quarantined with the NOT NULL reason, not loaded as a fact
    assert(table("dds/fct_deliveries").count() == 1)
    val q = table("dds/quarantine").collect()
    assert(q.length == 1 &&
      q.head.getAs[scala.collection.Seq[String]]("_violations")
        .contains("delivery_key_not_null"))
    // full replay: landing, fact, and quarantine all stay exactly-once
    Seq("load_stg", "stg_to_dds").foreach(PipelineMain.runStage(spark, _, wh, Some(src)))
    assert(table("stg/deliveries").count() == 2)
    assert(table("dds/fct_deliveries").count() == 1)
    assert(table("dds/quarantine").count() == 1)
  }

  test("unseeded dm_orders with a non-empty increment fails loudly (no silent consume)") {
    val wh = graft.stages.TempDirs.scratch("graft_pm_seed_wh_")
    val src = graft.stages.TempDirs.scratch("graft_pm_seed_src_")
    writeSource(src, Seq("c1" -> "Ann"), Seq(
      delivery("d1", "o1", "c1", "2024-05-01 11:00:00", 5, "100.00", "10.00")))
    PipelineMain.runStage(spark, "load_stg", wh, Some(src))
    val e = intercept[IllegalStateException](
      PipelineMain.runStage(spark, "stg_to_dds", wh, Some(src)))
    assert(e.getMessage.contains("dm_orders"))
  }

  test("three-stage spark-submit chain: two days, replay, durable state, ledger") {
    import spark.implicits._
    val wh = graft.stages.TempDirs.scratch("graft_pm_wh_")
    val src = graft.stages.TempDirs.scratch("graft_pm_src_")
    PipelineMain.seedOrders(spark, wh,
      Seq(("o1", 11, 1), ("o2", 12, 2), ("o3", 13, 3)).toDF("order_key", "id", "timestamp_id"))

    // day 1
    writeSource(src, Seq("c1" -> "Ann", "c2" -> "Bob"), Seq(
      delivery("d1", "o1", "c1", "2024-05-01 11:00:00", 5, "100.00", "10.00"),
      delivery("d2", "o2", "c2", "2024-05-01 12:00:00", 3, "200.00", "0.00")))
    Seq("load_stg", "stg_to_dds", "ledger_update").foreach(
      PipelineMain.runStage(spark, _, wh, Some(src)))
    assert(ledgerOf(wh)("Ann").getAs[Long]("orders_count") == 1L)

    // day 2: re-delivers d2, adds d3, renames c1 (SCD1) — a fresh source
    // snapshot, the same durable warehouse
    writeSource(src, Seq("c1" -> "Ann Smith", "c2" -> "Bob"), Seq(
      delivery("d2", "o2", "c2", "2024-05-01 12:00:00", 3, "200.00", "0.00"),
      delivery("d3", "o3", "c1", "2024-05-02 09:30:00", 4, "300.00", "30.00")))
    Seq("load_stg", "stg_to_dds", "ledger_update").foreach(
      PipelineMain.runStage(spark, _, wh, Some(src)))

    val ann = ledgerOf(wh)("Ann Smith")   // SCD1 rename reached the mart
    assert(ann.getAs[Long]("orders_count") == 2L)
    assert(ann.getAs[Double]("orders_total_sum") == 400.0)
    assert(ann.getAs[Double]("courier_reward_sum") == 388.0)  // floor 350 + 0.95*40

    // durable watermark: day-2 cursor survives "the JVM" (fresh read path)
    assert(graft.stages.State.readWatermark(spark, s"$wh/state/wf",
      PipelineMain.WorkflowKey, graft.stages.Pipeline.coldStartWatermark)
      == ts("2024-05-02 09:30:00"))

    // full replay of day 2 (task retry): every merge idempotent, mart unchanged
    Seq("load_stg", "stg_to_dds", "ledger_update").foreach(
      PipelineMain.runStage(spark, _, wh, Some(src)))
    val replayed = ledgerOf(wh)
    assert(replayed("Ann Smith").getAs[Long]("orders_count") == 2L)
    assert(replayed.size == 2)
    val fctDir = s"$wh/dds/fct_deliveries"
    val fct = new graft.stages.MergeTable(fctDir, Seq.empty)
    assert(spark.read.parquet(s"$fctDir/${fct.currentVersion.get}").count() == 3)
  }
}
