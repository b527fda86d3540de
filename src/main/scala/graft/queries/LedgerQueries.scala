package graft.queries

import org.apache.spark.sql.functions._
import graft.GQuery
import graft.stages.{EventsAdapter, Ledger}

/** Flagship: the courier monthly payout ledger (SURVEY.md §7.2) —
  * J1+J3+A3+A4+O1+O2+O5+O6+O7+O8 in one plan.
  */
object LedgerQueries {

  /** DuckDB mirror of stages.Ledger + stages.EventsAdapter. Decimal-exact
    * intermediates, DOUBLE outputs, explicit total order — see Ledger.scala
    * scaladoc for why this matches the Spark result bit-for-bit.
    */
  private val ledgerOracle: String = """
WITH facts AS (
  SELECT e.user_id AS courier_id,
         c.c_name AS courier_name,
         CAST(year(e.ts) AS INT) AS settlement_year,
         CAST(month(e.ts) AS INT) AS settlement_month,
         CAST(e.value AS DECIMAL(18,2)) AS order_sum,
         CAST(json_extract_string(e.props, '$.k') AS INT) % 6 AS rating,
         CAST(e.value AS DECIMAL(18,2)) * CAST(0.05 AS DECIMAL(3,2)) AS tips
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
), grouped AS (
  SELECT courier_id, courier_name, settlement_year, settlement_month,
         COUNT(order_sum) AS orders_count,
         SUM(order_sum) AS total_dec,
         AVG(CASE WHEN rating BETWEEN 1 AND 5 THEN rating END) AS rate_avg,
         SUM(tips) AS tips_dec
  FROM facts
  GROUP BY 1, 2, 3, 4
), pay AS (
  SELECT *,
         CAST(CASE WHEN rate_avg < 4   THEN total_dec * CAST(0.05 AS DECIMAL(3,2))
                   WHEN rate_avg < 4.5 THEN total_dec * CAST(0.07 AS DECIMAL(3,2))
                   WHEN rate_avg < 4.9 THEN total_dec * CAST(0.08 AS DECIMAL(3,2))
                   WHEN rate_avg >= 4.9 THEN total_dec * CAST(0.10 AS DECIMAL(3,2))
              END AS DECIMAL(38,6)) AS raw_payout
  FROM grouped
), floored AS (
  SELECT *,
         CASE WHEN rate_avg < 4 THEN
                (CASE WHEN raw_payout < 100 * orders_count THEN CAST(100 * orders_count AS DOUBLE)
                      ELSE CAST(raw_payout AS DOUBLE) END)
              WHEN rate_avg < 4.5 THEN
                (CASE WHEN raw_payout < 150 * orders_count THEN CAST(150 * orders_count AS DOUBLE)
                      ELSE CAST(raw_payout AS DOUBLE) END)
              WHEN rate_avg < 4.9 THEN
                (CASE WHEN raw_payout < 175 * orders_count THEN CAST(175 * orders_count AS DOUBLE)
                      ELSE CAST(raw_payout AS DOUBLE) END)
              WHEN rate_avg >= 4.9 THEN
                (CASE WHEN raw_payout < 200 * orders_count THEN CAST(200 * orders_count AS DOUBLE)
                      ELSE CAST(raw_payout AS DOUBLE) END)
         END AS courier_order_sum
  FROM pay
)
SELECT courier_id, courier_name, settlement_year, settlement_month,
       orders_count,
       CAST(total_dec AS DOUBLE) AS orders_total_sum,
       rate_avg,
       CAST(total_dec * CAST(0.25 AS DECIMAL(3,2)) AS DOUBLE) AS order_processing_fee,
       courier_order_sum,
       CAST(tips_dec AS DOUBLE) AS courier_tips_sum,
       courier_order_sum + CAST(tips_dec * CAST(0.95 AS DECIMAL(3,2)) AS DOUBLE) AS courier_reward_sum
FROM floored
ORDER BY courier_id, settlement_year, settlement_month
"""

  val all: Seq[GQuery] = Seq(
    GQuery(
      name = "ledger_monthly",
      run = (spark, sfDir) =>
        Ledger.monthlyLedger(EventsAdapter.deliveryFacts(spark, sfDir))
          .orderBy(col("courier_id"), col("settlement_year"), col("settlement_month")),
      oracle = Some(ledgerOracle),
      doc = "Flagship monthly payout ledger: courier_ledger_update.sql:2-73 over events×customer")
  )
}
