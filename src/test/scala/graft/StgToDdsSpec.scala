package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.stages.{State, StgToDds}

/** STG→DDS stages over reference-shaped JSON fixtures (FIXTURES.md §A1-A3)
  * + the watermark state round-trip (S3/S6).
  */
class StgToDdsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rawJson = Seq(
    ("""{"order_id":"o1","order_ts":"2024-05-01 10:00:00","delivery_id":"d1","courier_id":"c1","address":"a","delivery_ts":"2024-05-01 11:30:00","rate":5,"sum":120.50,"tip_sum":10.00}""",
      ts("2024-05-01 11:30:00")),
    ("""{"order_id":"o2","order_ts":"2024-05-01 12:00:00","delivery_id":"d2","courier_id":"c2","address":"b","delivery_ts":"2024-05-01 13:45:10","rate":0,"sum":75.25,"tip_sum":0.00}""",
      ts("2024-05-01 13:45:10")))

  private def stg = {
    import spark.implicits._
    rawJson.toDF("json_response", "delivery_ts")
  }

  test("parseDeliveries extracts typed columns from declared-schema JSON") {
    val parsed = StgToDds.parseDeliveries(stg).orderBy("delivery_key").collect()
    assert(parsed.length == 2)
    val d1 = parsed(0)
    assert(d1.getAs[String]("delivery_key") == "d1")
    assert(d1.getAs[String]("order_key") == "o1")
    assert(d1.getAs[String]("courier_key") == "c1")
    assert(d1.getAs[Int]("rating") == 5)
    assert(d1.getAs[java.math.BigDecimal]("order_sum").doubleValue() == 120.50)
    assert(d1.getAs[Timestamp]("ts") == ts("2024-05-01 11:30:00"))
  }

  test("timestampDimRows decomposes distinct timestamps") {
    val dim = StgToDds.timestampDimRows(StgToDds.parseDeliveries(stg))
      .orderBy("ts").collect()
    assert(dim.length == 2)
    assert(dim(0).getAs[Int]("year") == 2024)
    assert(dim(0).getAs[Int]("month") == 5)
    assert(dim(0).getAs[Int]("day") == 1)
    assert(dim(0).getAs[String]("time") == "11:30:00")
    assert(dim(1).getAs[String]("time") == "13:45:10")
  }

  test("courierDimRows: distinct keys joined to snapshot names") {
    import spark.implicits._
    val snapshot = Seq(("c1", "Ann"), ("c2", "Bob"), ("c9", "Zed"))
      .toDF("courier_key", "courier_name")
    val rows = StgToDds.courierDimRows(StgToDds.parseDeliveries(stg), snapshot)
      .orderBy("courier_key").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("c1", "Ann"), ("c2", "Bob")))   // c9 not in increment
  }

  test("resolveFacts replaces business keys with surrogate ids (J2)") {
    import spark.implicits._
    val nd = StgToDds.parseDeliveries(stg)
    val dmOrders = Seq(("o1", 11), ("o2", 12)).toDF("order_key", "id")
    val dmCouriers = Seq(("c1", 21), ("c2", 22)).toDF("courier_key", "id")
    val dmTs = StgToDds.withSurrogateId(
      StgToDds.timestampDimRows(nd).select(col("ts")), "id", col("ts"))
    val facts = StgToDds.resolveFacts(nd, dmOrders, dmTs, dmCouriers)
      .orderBy("delivery_key").collect()
    assert(facts.map(_.getAs[Int]("order_id")).toSeq == Seq(11, 12))
    assert(facts.map(_.getAs[Int]("courier_id")).toSeq == Seq(21, 22))
    assert(facts.map(_.getAs[Int]("timestamp_id")).toSeq == Seq(1, 2))
  }

  test("watermark state: default → advance → read-back; None does not advance") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString + "/wf"
    val dflt = ts("2022-01-01 00:00:00")
    assert(State.readWatermark(spark, dir, "wf1", dflt) == dflt)
    State.advanceWatermark(spark, dir, "wf1", Some(ts("2024-05-01 13:45:10")))
    assert(State.readWatermark(spark, dir, "wf1", dflt) == ts("2024-05-01 13:45:10"))
    // empty increment: cursor must not move (deliveries_stg_to_dds.sql:54)
    State.advanceWatermark(spark, dir, "wf1", None)
    assert(State.readWatermark(spark, dir, "wf1", dflt) == ts("2024-05-01 13:45:10"))
    // second workflow coexists
    State.advanceWatermark(spark, dir, "wf2", Some(ts("2024-06-01 00:00:00")))
    assert(State.readWatermark(spark, dir, "wf1", dflt) == ts("2024-05-01 13:45:10"))
    assert(State.readWatermark(spark, dir, "wf2", dflt) == ts("2024-06-01 00:00:00"))
  }

  test("legacy bare-parquet state tables are read and migrated, never silently reset") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-state-legacy").toString + "/wf"
    val dflt = ts("2022-01-01 00:00:00")
    // a state table written by the old layout: plain parquet, no _CURRENT
    Seq(("wf1", ts("2024-05-01 13:45:10")), ("wf2", ts("2024-06-01 00:00:00")))
      .toDF("workflow_key", "last_loaded_ts")
      .coalesce(1).write.parquet(dir)
    // read-through: the legacy cursor is visible, not reset to default
    assert(State.readWatermark(spark, dir, "wf1", dflt) == ts("2024-05-01 13:45:10"))
    // first advance migrates ALL legacy cursors into the versioned table
    State.advanceWatermark(spark, dir, "wf1", Some(ts("2024-05-02 09:00:00")))
    assert(State.readWatermark(spark, dir, "wf1", dflt) == ts("2024-05-02 09:00:00"))
    assert(State.readWatermark(spark, dir, "wf2", dflt) == ts("2024-06-01 00:00:00"),
      "the other workflow's legacy cursor must survive the migration")
  }

  test("malformed JSON rows parse to nulls and can be quarantined") {
    import spark.implicits._
    val mixed = Seq(
      (rawJson.head._1, rawJson.head._2),
      ("{not valid json", ts("2024-05-02 00:00:00")),
      ("""{"delivery_id":null}""", ts("2024-05-03 00:00:00")))
      .toDF("json_response", "delivery_ts")
    val parsed = StgToDds.parseDeliveries(mixed)
    val (good, quarantine) = (parsed.filter(col("delivery_key").isNotNull),
      parsed.filter(col("delivery_key").isNull))
    assert(good.count() == 1)
    assert(quarantine.count() == 2)   // bad syntax + missing business key
  }
}
