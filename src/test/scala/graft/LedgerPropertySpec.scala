package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based ledger invariants mirroring the reference CHECK
  * constraints (`DDL_cdm.dm_courier_ledger.sql:20-28`): money ≥ 0,
  * rate_avg ∈ [1,5] or NULL, payout ≥ tier floor × orders, reward formula,
  * group accounting.
  */
object LedgerProperties extends Properties("Ledger") {

  private lazy val spark = TestSpark.session

  private val factGen = for {
    courier <- Gen.choose(1, 6).map(i => s"c$i")
    month <- Gen.choose(1, 3)
    cents <- Gen.choose(0L, 100000L)
    rating <- Gen.choose(0, 5)
    tipCents <- Gen.choose(0L, 10000L)
  } yield (courier, courier.toUpperCase, 2024, month,
    BigDecimal(cents, 2), rating, BigDecimal(tipCents, 2))

  private val batchGen = Gen.nonEmptyListOf(factGen).map(_.take(60))

  private val schema = StructType(Seq(
    StructField("courier_id", StringType), StructField("courier_name", StringType),
    StructField("settlement_year", IntegerType), StructField("settlement_month", IntegerType),
    StructField("order_sum", DecimalType(18, 2)), StructField("rating", IntegerType),
    StructField("tips", DecimalType(18, 2))))

  private val floors = Map(1 -> 100, 2 -> 150, 3 -> 175, 4 -> 200)

  property("ledger invariants") = Prop.forAllNoShrink(batchGen) { rows =>
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (c, n, y, m, s, r, t) =>
        Row(c, n, y, m, s.bigDecimal, r, t.bigDecimal) }), schema)
    val out = graft.stages.Ledger.monthlyLedger(df).collect()

    val expectGroups = rows.map(r => (r._1, r._4)).distinct.size
    val groupsOk = out.length == expectGroups &&
      out.map(_.getAs[Long]("orders_count")).sum == rows.size

    val rowsOk = out.forall { r =>
      val moneyOk = r.getAs[Double]("orders_total_sum") >= 0.0 &&
        r.getAs[Double]("order_processing_fee") >= 0.0 &&
        r.getAs[Double]("courier_tips_sum") >= 0.0
      val rateIdx = r.fieldIndex("rate_avg")
      val payoutOk = if (r.isNullAt(rateIdx)) {
        // all-unrated group → NULL payout and reward (no-ELSE CASE preserved)
        r.isNullAt(r.fieldIndex("courier_order_sum")) &&
          r.isNullAt(r.fieldIndex("courier_reward_sum"))
      } else {
        val rate = r.getDouble(rateIdx)
        val tier = if (rate < 4) 1 else if (rate < 4.5) 2 else if (rate < 4.9) 3 else 4
        val payout = r.getAs[Double]("courier_order_sum")
        val reward = r.getAs[Double]("courier_reward_sum")
        val expected = payout + r.getAs[Double]("courier_tips_sum") * 0.95
        rate >= 1.0 && rate <= 5.0 &&
          payout >= floors(tier) * r.getAs[Long]("orders_count") &&
          math.abs(reward - expected) < 1e-6
      }
      moneyOk && payoutOk
    }
    groupsOk && rowsOk
  }
}
