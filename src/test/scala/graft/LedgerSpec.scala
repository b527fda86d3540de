package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.stages.Ledger

/** Reference-domain unit fixtures (FIXTURES.md §A5 edge cases):
  * tier boundaries at rate_avg 4.0 / 4.5 / 4.9, payout floors on both sides,
  * and the all-unrated → NULL rate_avg → NULL payout path
  * (reference `courier_ledger_update.sql:30-39,54-64`, no ELSE branch).
  */
class LedgerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import TestSpark._

  private def facts(rows: Seq[(String, String, Int, Int, String, Int, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("courier_id", StringType),
      StructField("courier_name", StringType),
      StructField("settlement_year", IntegerType),
      StructField("settlement_month", IntegerType),
      StructField("order_sum", DecimalType(18, 2)),
      StructField("rating", IntegerType),
      StructField("tips", DecimalType(18, 2))))
    val data = rows.map { case (id, nm, y, m, s, r, t) =>
      Row(id, nm, y, m, BigDecimal(s).setScale(2).bigDecimal, r, BigDecimal(t).setScale(2).bigDecimal)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
  }

  private def ledgerRow(df: DataFrame, courier: String): Row =
    df.filter(df("courier_id") === courier).collect().head

  test("tier boundaries: rate_avg <4 / ==4 / ==4.5 / ==4.9 pick 5%/7%/8%/10%") {
    // Each courier: one month, large sums so floors don't bite.
    val df = Ledger.monthlyLedger(facts(Seq(
      ("below4", "n", 2024, 1, "10000.00", 3, "0.00"),
      ("at4",    "n", 2024, 1, "10000.00", 4, "0.00"),
      ("at45",   "n", 2024, 1, "20000.00", 4, "0.00"),
      ("at45",   "n", 2024, 1, "20000.00", 5, "0.00"),   // avg = 4.5
      ("at49",   "n", 2024, 1, "50000.00", 5, "0.00"),
      ("at49",   "n", 2024, 1, "50000.00", 5, "0.00"),
      ("at49",   "n", 2024, 1, "50000.00", 5, "0.00"),
      ("at49",   "n", 2024, 1, "50000.00", 5, "0.00"),
      ("at49",   "n", 2024, 1, "50000.00", 5, "0.00"),
      ("at49",   "n", 2024, 1, "50000.00", 5, "0.00"),
      ("at49",   "n", 2024, 1, "50000.00", 5, "0.00"),
      ("at49",   "n", 2024, 1, "50000.00", 5, "0.00"),
      ("at49",   "n", 2024, 1, "50000.00", 5, "0.00"),
      ("at49",   "n", 2024, 1, "50000.00", 4, "0.00")    // avg = 4.9
    )).cache())
    assert(ledgerRow(df, "below4").getAs[Double]("courier_order_sum") == 500.0)
    assert(ledgerRow(df, "at4").getAs[Double]("courier_order_sum") == 700.0)
    assert(ledgerRow(df, "at45").getAs[Double]("courier_order_sum") == 3200.0)
    assert(ledgerRow(df, "at49").getAs[Double]("courier_order_sum") == 50000.0)
  }

  test("payout floor raises small payouts to floor*orders_count per tier") {
    val df = Ledger.monthlyLedger(facts(Seq(
      ("f1", "n", 2024, 1, "100.00", 3, "0.00"),   // 5% = 5 < 100 → 100
      ("f2", "n", 2024, 1, "100.00", 4, "0.00"),   // 7% = 7 < 150 → 150
      ("f3", "n", 2024, 1, "100.00", 5, "10.00"),  // avg 5 → 10% = 10 < 200 → 200
      ("f3", "n", 2024, 1, "100.00", 5, "10.00")   // 2 orders → floor 400
    )))
    assert(ledgerRow(df, "f1").getAs[Double]("courier_order_sum") == 100.0)
    assert(ledgerRow(df, "f2").getAs[Double]("courier_order_sum") == 150.0)
    val f3 = ledgerRow(df, "f3")
    assert(f3.getAs[Double]("courier_order_sum") == 400.0)
    // reward = floored payout + 0.95 * tips
    assert(f3.getAs[Double]("courier_reward_sum") == 419.0)
  }

  test("all-unrated courier: NULL rate_avg, NULL payout, NULL reward; fee/tips still present") {
    val df = Ledger.monthlyLedger(facts(Seq(
      ("u", "n", 2024, 1, "500.00", 0, "50.00"),
      ("u", "n", 2024, 1, "300.00", 0, "30.00"))))
    val r = ledgerRow(df, "u")
    assert(r.isNullAt(r.fieldIndex("rate_avg")))
    assert(r.isNullAt(r.fieldIndex("courier_order_sum")))
    assert(r.isNullAt(r.fieldIndex("courier_reward_sum")))
    assert(r.getAs[Long]("orders_count") == 2L)
    assert(r.getAs[Double]("orders_total_sum") == 800.0)
    assert(r.getAs[Double]("order_processing_fee") == 200.0)
    assert(r.getAs[Double]("courier_tips_sum") == 80.0)
  }

  test("unrated (0) deliveries are excluded from rate_avg but counted in sums") {
    val df = Ledger.monthlyLedger(facts(Seq(
      ("m", "n", 2024, 1, "1000.00", 5, "0.00"),
      ("m", "n", 2024, 1, "1000.00", 0, "0.00"))))   // rating 0 excluded from avg
    val r = ledgerRow(df, "m")
    assert(r.getAs[Double]("rate_avg") == 5.0)       // not 2.5
    assert(r.getAs[Long]("orders_count") == 2L)
    // avg 5 → 10% tier on 2000 = 200 < 200*2=400 → floor 400
    assert(r.getAs[Double]("courier_order_sum") == 400.0)
  }

  test("months aggregate independently per (courier, year, month)") {
    val df = Ledger.monthlyLedger(facts(Seq(
      ("c", "n", 2024, 1, "10000.00", 3, "1.00"),
      ("c", "n", 2024, 2, "10000.00", 5, "2.00"),
      ("c", "n", 2023, 2, "10000.00", 4, "3.00"))))
    assert(df.count() == 3)
    assert(df.filter("settlement_year = 2024 and settlement_month = 1")
      .collect().head.getAs[Double]("courier_order_sum") == 500.0)
  }
}
