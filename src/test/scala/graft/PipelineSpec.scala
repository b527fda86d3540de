package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.stages.Pipeline
import graft.stages.Pipeline.DdsState

/** End-to-end incremental pipeline over reference-shaped fixtures:
  * two daily runs with re-delivery, an SCD1 rename, an empty increment,
  * and the ledger rebuild — the full DAG semantics in one spec.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def ts(s: String) = Timestamp.valueOf(s)

  private def delivery(id: String, order: String, courier: String,
                       dts: String, rate: Int, sum: String, tip: String): (String, Timestamp) =
    (s"""{"order_id":"$order","order_ts":"$dts","delivery_id":"$id","courier_id":"$courier",""" +
      s""""address":"a","delivery_ts":"$dts","rate":$rate,"sum":$sum,"tip_sum":$tip}""",
      ts(dts))

  private def stgOf(rows: (String, Timestamp)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("json_response", "delivery_ts")
  }

  private def couriersOf(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("courier_key", "courier_name")
  }

  private def emptyDds: DdsState = {
    val dmCouriers = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", IntegerType), StructField("courier_key", StringType),
        StructField("courier_name", StringType))))
    val dmTs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", IntegerType), StructField("ts", TimestampType),
        StructField("year", IntegerType), StructField("month", IntegerType),
        StructField("day", IntegerType), StructField("time", StringType),
        StructField("date", DateType))))
    val fct = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("delivery_key", StringType), StructField("order_id", IntegerType),
        StructField("timestamp_id", IntegerType), StructField("order_sum", DecimalType(14, 2)),
        StructField("courier_id", IntegerType), StructField("rating", IntegerType),
        StructField("tips", DecimalType(14, 2)))))
    DdsState(dmCouriers, dmTs, fct)
  }

  private def dmOrders: DataFrame = {
    import spark.implicits._
    // order_key, id, timestamp_id (the order's ts → same ids the ts dim gets)
    Seq(("o1", 11, 1), ("o2", 12, 2), ("o3", 13, 3)).toDF("order_key", "id", "timestamp_id")
  }

  test("two incremental runs: SCD0 facts, SCD1 couriers, watermark, ledger") {
    val day1 = stgOf(
      delivery("d1", "o1", "c1", "2024-05-01 11:00:00", 5, "100.00", "10.00"),
      delivery("d2", "o2", "c2", "2024-05-01 12:00:00", 3, "200.00", "0.00"))
    val snapshot1 = couriersOf("c1" -> "Ann", "c2" -> "Bob")

    val Pipeline.LoadResult(dds1, wm1, q1, _) = Pipeline.incrementalLoad(
      day1, snapshot1, dmOrders, emptyDds, Pipeline.coldStartWatermark)
    assert(q1.count() == 0)
    assert(wm1.contains(ts("2024-05-01 12:00:00")))
    assert(dds1.fctDeliveries.count() == 2)
    assert(dds1.dmCouriers.count() == 2)

    // day 2: re-delivers d2 (must be ignored), adds d3, renames c1 (SCD1)
    val day2 = stgOf(
      delivery("d2", "o2", "c2", "2024-05-01 12:00:00", 3, "200.00", "0.00"),
      delivery("d3", "o3", "c1", "2024-05-02 09:30:00", 4, "300.00", "30.00"))
    val snapshot2 = couriersOf("c1" -> "Ann Smith", "c2" -> "Bob")

    val Pipeline.LoadResult(dds2, wm2, _, _) = Pipeline.incrementalLoad(
      day2, snapshot2, dmOrders, dds1, wm1.get)
    assert(wm2.contains(ts("2024-05-02 09:30:00")))
    // d2 re-delivery filtered by watermark; d3 appended
    assert(dds2.fctDeliveries.count() == 3)
    // SCD1: c1 renamed, id stable
    val c1 = dds2.dmCouriers.filter("courier_key = 'c1'").collect().head
    assert(c1.getAs[String]("courier_name") == "Ann Smith")
    val c1IdBefore = dds1.dmCouriers.filter("courier_key = 'c1'")
      .collect().head.getAs[Int]("id")
    assert(c1.getAs[Int]("id") == c1IdBefore)

    // empty increment: nothing changes, watermark does not advance
    val Pipeline.LoadResult(dds3, wm3, _, _) = Pipeline.incrementalLoad(
      stgOf(), snapshot2, dmOrders, dds2, wm2.get)
    assert(wm3.isEmpty)
    assert(dds3.fctDeliveries.count() == 3)

    // ledger rebuild: c1 has d1 (100, rate 5) + d3 (300, rate 4) in May 2024
    val ledger = Pipeline.ledgerRebuild(dds3, dmOrders)
      .filter("settlement_year = 2024 AND settlement_month = 5")
      .collect().map(r => r.getAs[String]("courier_name") -> r).toMap
    val ann = ledger("Ann Smith")
    assert(ann.getAs[Long]("orders_count") == 2L)
    assert(ann.getAs[Double]("orders_total_sum") == 400.0)
    assert(ann.getAs[Double]("rate_avg") == 4.5)
    // avg 4.5 → 8% tier: 32 < 175*2 → floor 350; reward = 350 + 0.95*40
    assert(ann.getAs[Double]("courier_order_sum") == 350.0)
    assert(ann.getAs[Double]("courier_reward_sum") == 350.0 + 38.0)
    val bob = ledger("Bob")
    assert(bob.getAs[Double]("rate_avg") == 3.0)
    assert(bob.getAs[Double]("courier_order_sum") == 100.0)  // 5% of 200 → floor 100
  }

  test("CHECK violations are quarantined with reasons, not loaded, and don't stall the watermark") {
    val day = stgOf(
      delivery("ok", "o1", "c1", "2024-06-01 10:00:00", 5, "100.00", "1.00"),
      delivery("bad_rate", "o2", "c2", "2024-06-01 11:00:00", 9, "50.00", "0.00"),
      delivery("bad_sum", "o3", "c1", "2024-06-01 12:00:00", 3, "-7.00", "0.00"))
    val Pipeline.LoadResult(dds, wm, quarantined, _) = Pipeline.incrementalLoad(
      day, couriersOf("c1" -> "Ann", "c2" -> "Bob"), dmOrders, emptyDds,
      Pipeline.coldStartWatermark)
    // only the clean row loads
    assert(dds.fctDeliveries.collect().map(_.getAs[String]("delivery_key")).toSeq == Seq("ok"))
    // the bad rows are inspectable with their reasons
    val reasons = quarantined.collect()
      .map(r => r.getAs[String]("delivery_key") ->
        r.getAs[scala.collection.Seq[String]]("_violations").toSeq).toMap
    assert(reasons("bad_rate") == Seq("rating_range"))
    assert(reasons("bad_sum") == Seq("order_sum_non_negative"))
    // quarantined rows were dispositioned: the cursor moves past them
    assert(wm.contains(ts("2024-06-01 12:00:00")))
  }
}
