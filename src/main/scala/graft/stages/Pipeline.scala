package graft.stages

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference DAG (`dags/courier_ledger_dag.py:41-42`) as sequential
  * stage functions over one SparkSession — load couriers/deliveries,
  * STG→DDS normalization, fact load, ledger rebuild — with the watermark
  * advanced only after a successful fact write (SURVEY.md §7.3 ordering).
  *
  * Tables are plain DataFrames in/out, storage-agnostic: the orchestrator
  * (Airflow `SparkSubmitOperator` per stage in production, a single driver
  * call in tests) decides where each layer persists. All stages are
  * idempotent under replay because every write path flows through the
  * [[Merge]] rewrites.
  */
object Pipeline {

  final case class DdsState(
      dmCouriers: DataFrame,   // id, courier_key, courier_name
      dmTimestamps: DataFrame, // id, ts, year, month, day, time, date
      fctDeliveries: DataFrame) // delivery_key, order_id, timestamp_id, order_sum, courier_id, rating, tips

  val coldStartWatermark: Timestamp = Timestamp.valueOf("2022-01-01 00:00:00")

  /** One incremental run's outcome: the updated DDS state, the advanced
    * watermark (None if the increment was empty), the rows that failed
    * the CHECK-constraint set — quarantined with their violation reasons
    * instead of aborting the load (see [[Validate]]) — and `newFacts`,
    * THIS increment's key-resolved fact rows alone. A storage-backed
    * caller commits `newFacts` (an O(increment) incoming side for the
    * merge), never the full merged `dds.fctDeliveries`, which would make
    * every daily commit's incoming side O(table).
    */
  final case class LoadResult(
      dds: DdsState, watermark: Option[Timestamp], quarantined: DataFrame,
      newFacts: DataFrame)

  /** One incremental run: the courier/timestamp/fact loads of
    * `couriers_stg_to_dds.sql` / `timestamps_stg_to_dds.sql` /
    * `deliveries_stg_to_dds.sql` against the current DDS state.
    *
    * @param stgDeliveries raw STG rows (json_response, delivery_ts)
    * @param stgCouriers   courier snapshot (courier_key, courier_name)
    * @param watermark     last processed delivery_ts (strict >)
    * @param dmOrders      pre-existing order dimension (order_key, id)
    * @return updated DDS state + the new watermark (None if increment empty)
    */
  def incrementalLoad(stgDeliveries: DataFrame, stgCouriers: DataFrame,
                      dmOrders: DataFrame, dds: DdsState,
                      watermark: Timestamp): LoadResult =
    // O3: watermark filter with a driver-resolved literal → parquet pushdown
    incrementalLoadParsed(
      StgToDds.parseDeliveries(
        stgDeliveries.filter(col("delivery_ts") > lit(watermark))),
      stgCouriers, dmOrders, dds)

  /** [[incrementalLoad]] from an ALREADY-PARSED increment — the entry for
    * callers that materialize the parse at a stage boundary (the
    * spark-submit packaging writes it to scratch parquet first: the load
    * runs ~6 actions over this lineage, and without the boundary each one
    * re-scans STG and re-runs from_json + the CHECK evaluation).
    */
  /** @param maxTsHint the increment's max `ts`, when the caller already
    *   knows it (e.g. observed on the stage-boundary write via
    *   `Dataset.observe` — see `PipelineMain.stgToDds`). `Some(x)` skips
    *   this function's cursor pass over `parsed` entirely; `None` keeps
    *   the self-contained behavior. At 100 TB the saved pass is a full
    *   scan of the increment.
    */
  def incrementalLoadParsed(parsed: DataFrame, stgCouriers: DataFrame,
                            dmOrders: DataFrame, dds: DdsState,
                            maxTsHint: Option[Option[Timestamp]] = None): LoadResult = {
    // S7 runtime CHECKs: violating rows are quarantined with reasons, not
    // loaded and not allowed to abort the batch (the reference's DDL CHECK
    // semantics, minus the Postgres batch abort)
    val (newDeliveries, quarantined) = Validate.split(parsed, Validate.deliveryChecks)

    // S4/SCD1 courier dim: new keys appended, names overwritten
    val courierRows = StgToDds.courierDimRows(newDeliveries, stgCouriers)
    val dmCouriers1 = {
      val merged = Merge.upsert(
        dds.dmCouriers.select("courier_key", "courier_name"), courierRows, Seq("courier_key"))
      assignDimIds(merged, dds.dmCouriers, "courier_key")
    }

    // S5/SCD0 timestamp dim: insert-ignore
    val tsRows = StgToDds.timestampDimRows(newDeliveries)
    val dmTimestamps1 = {
      val merged = Merge.insertIgnore(
        dds.dmTimestamps.drop("id"), tsRows, Seq("ts"))
      assignDimIds(merged, dds.dmTimestamps, "ts")
    }

    // J2 fact resolution + S5 insert-ignore on delivery_key
    val facts = StgToDds.resolveFacts(newDeliveries, dmOrders, dmTimestamps1, dmCouriers1)
    val fct1 = Merge.insertIgnore(dds.fctDeliveries, facts, Seq("delivery_key"))

    // A1 cursor: only advance when the increment was non-empty. Quarantined
    // rows DO advance it (they were read and dispositioned; re-reading them
    // forever would wedge the pipeline on one bad record).
    val watermark = maxTsHint.getOrElse(
      State.tsValue(parsed.agg(max(col("ts"))).collect().head, 0))
    LoadResult(DdsState(dmCouriers1, dmTimestamps1, fct1), watermark, quarantined,
      newFacts = facts)
  }

  /** Stable surrogate ids across replays: rows whose business key already
    * had an id keep it; genuinely new keys get ids after the current max in
    * business-key order (the Spark stand-in for Postgres `serial`).
    */
  private def assignDimIds(merged: DataFrame, previous: DataFrame, key: String): DataFrame = {
    val prevIds = previous.select(col(key), col("id"))
    val withOld = merged.join(prevIds, Seq(key), "left")
    val maxOld = previous.agg(coalesce(max(col("id")), lit(0))).collect().head.getInt(0)
    val fresh = StgToDds.withSurrogateId(
        withOld.filter(col("id").isNull).drop("id"), "id", col(key))
      .withColumn("id", col("id") + maxOld)
    withOld.filter(col("id").isNotNull).unionByName(fresh)
  }

  /** DDS→CDM: the full-recompute ledger rebuild
    * (`courier_ledger_update.sql`) — month from the ORDER's timestamp via
    * the 2-hop snowflake join, then [[Ledger.monthlyLedger]].
    */
  def ledgerRebuild(dds: DdsState, dmOrders: DataFrame): DataFrame = {
    // Broadcast hint ONLY on the courier dim (structurally dim-sized). The
    // order and timestamp dims are fact-scale (one order / one distinct ts
    // per delivery) — their strategy is left to Catalyst/AQE, which
    // broadcasts while small and switches to a shuffle join at scale.
    val facts = dds.fctDeliveries
      .join(broadcast(dds.dmCouriers.select(col("id").as("courier_id"),
        col("courier_name"))), Seq("courier_id"))
      .join(dmOrders.select(col("id").as("order_id"),
        col("timestamp_id").as("order_ts_id")), Seq("order_id"))
      .join(dds.dmTimestamps.select(col("id").as("order_ts_id"),
        col("year").as("settlement_year"), col("month").as("settlement_month")),
        Seq("order_ts_id"))
    Ledger.monthlyLedger(facts)
  }
}
