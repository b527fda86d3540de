package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.stages.Extract

/** API → STG landing conflict semantics (S1/S2 + S4/S5 at the STG layer). */
class ExtractSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import org.apache.spark.sql.functions._

  private def courierJson(id: String, name: String) =
    s"""{"_id":"$id","name":"$name"}"""

  private def deliveryJson(id: String, ts: String) =
    s"""{"delivery_id":"$id","delivery_ts":"$ts","sum":10.00}"""

  test("courier landing is SCD1: re-landed snapshot overwrites payload") {
    import spark.implicits._
    val stg0 = Seq((courierJson("c1", "Ann"), "c1"))
      .toDF("json_response", "courier_key")
    val api = Seq(courierJson("c1", "Ann Smith"), courierJson("c2", "Bob"))
      .toDF("json_response")
    val landed = Extract.landCouriers(api, stg0)
    assert(landed.count() == 2)
    val c1 = landed.filter("courier_key = 'c1'").collect().head.getAs[String]("json_response")
    assert(c1.contains("Ann Smith"))
  }

  test("delivery landing is SCD0: re-delivered records ignored, ts extracted") {
    import spark.implicits._
    val stg0 = Seq((deliveryJson("d1", "2024-05-01 10:00:00"), "d1",
        java.sql.Timestamp.valueOf("2024-05-01 10:00:00")))
      .toDF("json_response", "delivery_key", "delivery_ts")
    val api = Seq(
      deliveryJson("d1", "2024-05-01 10:00:00"),     // re-delivery
      deliveryJson("d2", "2024-05-02 11:30:00"))
      .toDF("json_response")
    val landed = Extract.landDeliveries(api, stg0)
    assert(landed.count() == 2)
    val d2 = landed.filter("delivery_key = 'd2'").collect().head
    assert(d2.getAs[java.sql.Timestamp]("delivery_ts") == java.sql.Timestamp.valueOf("2024-05-02 11:30:00"))
  }
}
