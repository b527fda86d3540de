package graft.stages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Maps the driver corpus onto the reference's delivery-fact shape
  * (FIXTURES.md §B role mapping): `events` rows play deliveries,
  * `customer` plays the courier dimension.
  *
  * Derivations are deliberately cross-engine-deterministic:
  *   - money: `value` is a 2-decimal double → CAST to DECIMAL(18,2) is exact,
  *     all downstream arithmetic stays decimal;
  *   - rating: `props` JSON field `k` (0..99) % 6 → 0..5, 0 = unrated —
  *     exercises O1 (JSON extraction) and O2 (casts) on the way in;
  *   - tips: 5% of order value, exact decimal.
  *
  * The courier-name lookup is the reference's J1 dim join
  * (`sql/couriers_stg_to_dds.sql:12-19`): `customer` is small relative to the
  * fact side at every scale factor, so it is explicitly broadcast — at 100 TB
  * the fact scan never shuffles for this join.
  */
object EventsAdapter {

  /** events × customer → columns required by [[Ledger.monthlyLedger]]. */
  def deliveryFacts(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val couriers = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"))

    events
      .join(broadcast(couriers), events("user_id") === couriers("c_custkey"))
      .select(
        col("user_id").as("courier_id"),
        col("c_name").as("courier_name"),
        year(col("ts")).as("settlement_year"),
        month(col("ts")).as("settlement_month"),
        col("value").cast("decimal(18,2)").as("order_sum"),
        (get_json_object(col("props"), "$.k").cast("int") % 6).as("rating"),
        (col("value").cast("decimal(18,2)") * lit(BigDecimal("0.05"))).as("tips"))
  }
}
