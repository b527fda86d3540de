package graft.stages

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** API → STG landing (S1/S2): raw JSON records land keyed by their business
  * key with the reference's per-table conflict semantics
  * (`modules/load_couriers.py:39-49`, `modules/load_deliveries.py:55-64`).
  *
  * The raw payload is stored verbatim (`json_response` text) — schema-on-read
  * happens later at the STG→DDS boundary, exactly like the reference; only
  * the business key (and `delivery_ts` for deliveries) is extracted here,
  * mirroring the STG DDLs (`DDL_stg.deliverysystem_couriers.sql:5-11`,
  * `DDL_stg.deliverysystem_deliveries.sql:5-12`).
  *
  * At scale the STG layer is written date-partitioned (partitionBy on the
  * delivery date) so the downstream watermark scan prunes partitions — see
  * ScaleSpec's pruning demonstration and ARCHITECTURE.md.
  */
object Extract {

  /** Courier snapshot landing, SCD1: re-landed couriers overwrite their
    * stored payload (`ON CONFLICT (courier_key) DO UPDATE`).
    * @param api rows with `json_response` containing `_id`
    */
  def landCouriers(api: DataFrame, existingStg: DataFrame): DataFrame = {
    val incoming = api.select(
      col("json_response"),
      get_json_object(col("json_response"), "$._id").as("courier_key"))
    Merge.upsert(existingStg, incoming, Seq("courier_key"))
  }

  /** Delivery increment landing, SCD0: re-delivered records are ignored
    * (`ON CONFLICT (delivery_key) DO NOTHING`).
    * @param api rows with `json_response` containing `delivery_id` + `delivery_ts`
    */
  def landDeliveries(api: DataFrame, existingStg: DataFrame): DataFrame = {
    val incoming = api.select(
      col("json_response"),
      get_json_object(col("json_response"), "$.delivery_id").as("delivery_key"),
      get_json_object(col("json_response"), "$.delivery_ts")
        .cast("timestamp").as("delivery_ts"))
    Merge.insertIgnore(existingStg, incoming, Seq("delivery_key"))
  }
}
