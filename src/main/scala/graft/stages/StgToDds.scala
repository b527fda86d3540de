package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STG → DDS normalization: JSON extraction, dimension builds, fact key
  * resolution — `sql/couriers_stg_to_dds.sql`, `sql/timestamps_stg_to_dds.sql`,
  * `sql/deliveries_stg_to_dds.sql` re-expressed as DataFrame stages.
  */
object StgToDds {

  /** Declared schema of the raw delivery JSON (`DWH Design (ENG).md:27-37`).
    * Explicit StructType — no inference in production paths (SURVEY.md §1.3).
    */
  val deliveryJsonSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("order_ts", TimestampType),
    StructField("delivery_id", StringType),
    StructField("courier_id", StringType),
    StructField("address", StringType),
    StructField("delivery_ts", TimestampType),
    StructField("rate", IntegerType),
    StructField("sum", DecimalType(14, 2)),
    StructField("tip_sum", DecimalType(14, 2))))

  /** O1+O2: schema-on-read projection of STG rows
    * (`sql/deliveries_stg_to_dds.sql:2-17`). One `from_json` with a declared
    * schema (single parse, nested-field pruning applies) instead of the
    * reference's seven per-field `->>` extractions.
    * Input: (json_response string, delivery_ts timestamp); the watermark
    * filter (O3) is applied by the caller with a driver-resolved literal.
    */
  def parseDeliveries(stgDeliveries: DataFrame): DataFrame =
    stgDeliveries
      .withColumn("j", from_json(col("json_response"), deliveryJsonSchema))
      .select(
        col("j.delivery_id").as("delivery_key"),
        col("j.order_id").as("order_key"),
        col("delivery_ts").as("ts"),
        col("j.sum").as("order_sum"),
        col("j.courier_id").as("courier_key"),
        col("j.rate").as("rating"),
        col("j.tip_sum").as("tips"))

  /** J1+O4: courier dimension rows for the increment
    * (`sql/couriers_stg_to_dds.sql:2-19`): distinct courier keys of the new
    * deliveries, names looked up from the courier snapshot. The dedup runs
    * BEFORE the join (reference keeps this order deliberately — SURVEY.md §4)
    * and the snapshot side is broadcast: courier cardinality is dim-sized at
    * any data scale, so the fact side never shuffles.
    */
  def courierDimRows(newDeliveries: DataFrame, courierSnapshot: DataFrame): DataFrame =
    newDeliveries
      .select(col("courier_key")).distinct()
      .join(broadcast(courierSnapshot), Seq("courier_key"))
      .select(col("courier_key"), col("courier_name"))

  /** O4+O5: timestamp dimension rows (`sql/timestamps_stg_to_dds.sql:10-19`):
    * distinct delivery timestamps decomposed into calendar attributes.
    * Postgres `time` has no Spark type → HH:mm:ss string (SURVEY.md §1.2).
    */
  def timestampDimRows(newDeliveries: DataFrame): DataFrame =
    newDeliveries
      .select(col("ts")).distinct()
      .select(
        col("ts"),
        year(col("ts")).as("year"),
        month(col("ts")).as("month"),
        dayofmonth(col("ts")).as("day"),
        date_format(col("ts"), "HH:mm:ss").as("time"),
        col("ts").cast(DateType).as("date"))

  /** Deterministic surrogate keys: dense ids in business-key order —
    * the Spark stand-in for Postgres `serial` (SURVEY.md §7.3). A single
    * unpartitioned window is intentional: dimensions are small by definition;
    * facts never get window-generated ids (their identity is the business
    * key). Deterministic ordering keeps ids stable across replays, unlike
    * `monotonically_increasing_id`.
    */
  def withSurrogateId(dim: DataFrame, idCol: String, orderBy: Column): DataFrame =
    dim.withColumn(idCol, row_number().over(Window.orderBy(orderBy)))

  /** Scale variant of [[withSurrogateId]] for LARGE dimensions (e.g. a
    * timestamp dim with millions of distinct values): a range-partitioned
    * sort followed by `zipWithIndex`, which computes per-partition offsets
    * with one tiny driver round-trip instead of collapsing the data to a
    * single window partition. For a unique order key this produces ids
    * IDENTICAL to `row_number() over (order by key)` — same determinism,
    * distributed. The id column is IntegerType to match the serial-key
    * contract (dims beyond 2^31 should switch this and the DDLs to long).
    */
  def withSurrogateIdScalable(dim: DataFrame, idCol: String, orderBy: Column): DataFrame = {
    val sorted = dim.orderBy(orderBy)
    val schema = StructType(sorted.schema.fields :+ StructField(idCol, IntegerType, nullable = false))
    val withIds = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1).toInt)
    }
    sorted.sparkSession.createDataFrame(withIds, schema)
  }

  /** J2: fact key resolution (`sql/deliveries_stg_to_dds.sql:23-36`) —
    * replace business keys with surrogate ids via three equi-joins. Only the
    * courier dim carries an explicit broadcast hint: couriers are
    * structurally dim-sized at any data scale. The order and timestamp dims
    * grow WITH the facts (≈ one order / one distinct ts per delivery), so
    * their join strategy is left to Catalyst/AQE — broadcast while under
    * `autoBroadcastJoinThreshold`, shuffle join beyond it. An explicit hint
    * here would be honored regardless of size and OOM the driver at 100×.
    * The timestamp join is EXACT equality (µs precision, session TZ pinned
    * UTC).
    */
  def resolveFacts(newDeliveries: DataFrame, dmOrders: DataFrame,
                   dmTimestamps: DataFrame, dmCouriers: DataFrame): DataFrame =
    newDeliveries
      .join(dmOrders.select(col("order_key"), col("id").as("order_id")),
        Seq("order_key"))
      .join(dmTimestamps.select(col("ts"), col("id").as("timestamp_id")),
        Seq("ts"))
      .join(broadcast(dmCouriers.select(col("courier_key"), col("id").as("courier_id"))),
        Seq("courier_key"))
      .select(
        col("delivery_key"), col("order_id"), col("timestamp_id"),
        col("order_sum"), col("courier_id"), col("rating"), col("tips"))
}
