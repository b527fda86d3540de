package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Monthly courier payout ledger — the reference's flagship aggregation.
  *
  * Re-expresses `sql/courier_ledger_update.sql:2-73` (reference repo) as a
  * single declarative Spark plan: one hash aggregation (partial + final,
  * map-side combine for free) followed by scalar CASE/arithmetic projections
  * that stay inside whole-stage codegen.
  *
  * Semantics preserved exactly:
  *   - `rate_avg = avg(rating) FILTER (WHERE rating BETWEEN 1 AND 5)`
  *     (`courier_ledger_update.sql:10`) — rating 0 means "unrated"
  *     (`DDL_dds.fct_deliveries.sql:12`); expressed as `avg(when(...))`,
  *     which skips NULLs exactly like the SQL FILTER clause.
  *   - The tier CASE (`courier_ledger_update.sql:30-39`) has NO else branch:
  *     a courier whose every delivery is unrated has NULL `rate_avg`, which
  *     propagates NULL through `courier_order_sum` and `courier_reward_sum`.
  *   - Per-order payout floors (`courier_ledger_update.sql:54-64`):
  *     tier payout is raised to `floor_rate * orders_count` when below it.
  *
  * Numeric strategy (oracle parity at any scale): money stays DECIMAL through
  * every sum/multiply — decimal arithmetic is exact, so results are
  * independent of partitioning / aggregation order, which is what makes the
  * same answer come out of a 1000-executor shuffle and a single-threaded
  * oracle. Final outputs are cast to DOUBLE (exact conversion, deterministic)
  * so the output schema is engine-neutral.
  *
  * Scale posture: the groupBy keys are (courier, year, month) — cardinality
  * ~couriers×months, far below input rows, so partial aggregation collapses
  * the shuffle to ~|groups| rows per partition. No window functions, no
  * driver-side state. At 100 TB the only shuffle is this single hash
  * exchange on the group keys.
  */
object Ledger {

  /** Tier schedule: (upper-exclusive avg-rating bound → payout share, per-order floor).
    * Bounds/values from `courier_ledger_update.sql:30-39,54-64`.
    */
  final case class Tier(rateBelow: Option[Double], share: BigDecimal, floorPerOrder: Int)

  val tiers: Seq[Tier] = Seq(
    Tier(Some(4.0), BigDecimal("0.05"), 100),
    Tier(Some(4.5), BigDecimal("0.07"), 150),
    Tier(Some(4.9), BigDecimal("0.08"), 175),
    Tier(None,      BigDecimal("0.10"), 200))

  /** SQL CASE evaluates branches in order, so a plain ordered when-chain
    * reproduces the reference's `rate_avg < 4 / < 4.5 / < 4.9 / >= 4.9`.
    * NULL rate_avg fails every condition → NULL (no otherwise).
    */
  private def tierCase(value: Tier => Column): Column = {
    def cond(t: Tier): Column = t.rateBelow match {
      case Some(b) => col("rate_avg") < b
      case None    => col("rate_avg") >= 4.9
    }
    tiers.tail.foldLeft(when(cond(tiers.head), value(tiers.head))) {
      (acc, t) => acc.when(cond(t), value(t))
    }
  }

  /** Input contract: columns
    *   courier_id (any key type), courier_name string,
    *   settlement_year int, settlement_month int,
    *   order_sum decimal, rating int (0 = unrated), tips decimal.
    * Output: the `cdm.dm_courier_ledger` measure set
    * (`DDL_cdm.dm_courier_ledger.sql:5-18`), money as double.
    */
  def monthlyLedger(facts: DataFrame): DataFrame = {
    val grouped = facts
      .groupBy(col("courier_id"), col("courier_name"),
               col("settlement_year"), col("settlement_month"))
      .agg(
        count(col("order_sum")).as("orders_count"),
        sum(col("order_sum")).as("_total_dec"),
        // FILTER (WHERE rating BETWEEN 1 AND 5): when() yields NULL outside
        // the band and avg skips NULLs — identical semantics.
        avg(when(col("rating").between(1, 5), col("rating"))).as("rate_avg"),
        sum(col("tips")).as("_tips_dec"))

    // Tier payout before floors — exact decimal: total * share.
    val rawPayout = tierCase(t => (col("_total_dec") * lit(t.share)).cast("decimal(38,6)"))

    // Floor check: decimal-vs-bigint comparison is exact; the chosen branch
    // is only then cast to double.
    val floored = tierCase { t =>
      val floorTotal = lit(t.floorPerOrder.toLong) * col("orders_count")
      when(col("_raw_payout") < floorTotal, floorTotal.cast("double"))
        .otherwise(col("_raw_payout").cast("double"))
    }

    grouped
      .withColumn("_raw_payout", rawPayout)
      .withColumn("courier_order_sum", floored)
      .select(
        col("courier_id"), col("courier_name"),
        col("settlement_year"), col("settlement_month"),
        col("orders_count"),
        col("_total_dec").cast("double").as("orders_total_sum"),
        col("rate_avg"),
        (col("_total_dec") * lit(BigDecimal("0.25"))).cast("double").as("order_processing_fee"),
        col("courier_order_sum"),
        col("_tips_dec").cast("double").as("courier_tips_sum"),
        (col("courier_order_sum") +
          (col("_tips_dec") * lit(BigDecimal("0.95"))).cast("double")).as("courier_reward_sum"))
  }
}
