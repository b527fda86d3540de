package graft.stages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `spark-submit` packaging of the pipeline DAG — what each Airflow
  * task actually launches in production (`tools/airflow_dag_graft.py`
  * holds the DAG shape; the reference runs the same chain with
  * `PostgresOperator`s, `dags/courier_ledger_dag.py:41-42`):
  *
  *   spark-submit --class graft.stages.PipelineMain <jar> <stage> <warehouse> [args]
  *
  * Stages, each a separate JVM sharing ONLY durable storage (every layer
  * a [[MergeTable]] under the warehouse root — crash-safe pointer-flip
  * commits, so a task retry resumes from the last committed version):
  *
  *   - `load_stg <warehouse> <sourceDir>` — land the source snapshot into
  *     `stg/` (couriers SCD1, deliveries SCD0 on the business keys) — the
  *     S1/S2 extraction boundary (a production deployment points this at
  *     [[graft.sources.PagedJsonSource]]; the driver corpus stands in
  *     here);
  *   - `stg_to_dds <warehouse>` — the watermark-incremental
  *     [[Pipeline.incrementalLoad]]: dims merged (SCD1/SCD0 with stable
  *     surrogate ids), facts insert-ignored, CHECK violations quarantined,
  *     and the cursor advanced ONLY after the fact commit
  *     (write-then-advance, SURVEY.md §7.3);
  *   - `ledger_update <warehouse>` — the full-recompute
  *     [[Pipeline.ledgerRebuild]] upserted into `cdm/ledger`.
  *
  * Layout: `stg/{couriers,deliveries}`, `dds/{dm_couriers, dm_timestamps,
  * dm_orders, fct_deliveries, quarantine}`, `cdm/ledger`, `state/wf` —
  * `dds/dm_orders` is the pre-existing DWH dimension the reference
  * assumes (`DWH Design (ENG).md:76`); seed it before the first run.
  */
object PipelineMain {

  val WorkflowKey = "deliveries_stg_to_dds"

  // declared layer schemas (FIXTURES.md A2-A4) — what an empty table reads as
  private val stgDeliverySchema = StructType(Seq(
    StructField("json_response", StringType), StructField("delivery_key", StringType),
    StructField("delivery_ts", TimestampType)))
  private val stgCourierSchema = StructType(Seq(
    StructField("courier_key", StringType), StructField("courier_name", StringType)))
  private val dmCourierSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("courier_key", StringType),
    StructField("courier_name", StringType)))
  private val dmTimestampSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("ts", TimestampType),
    StructField("year", IntegerType), StructField("month", IntegerType),
    StructField("day", IntegerType), StructField("time", StringType),
    StructField("date", DateType)))
  private val fctSchema = StructType(Seq(
    StructField("delivery_key", StringType), StructField("order_id", IntegerType),
    StructField("timestamp_id", IntegerType), StructField("order_sum", DecimalType(14, 2)),
    StructField("courier_id", IntegerType), StructField("rating", IntegerType),
    StructField("tips", DecimalType(14, 2))))
  private val dmOrderSchema = StructType(Seq(
    StructField("order_key", StringType), StructField("id", IntegerType),
    StructField("timestamp_id", IntegerType)))

  private def t(warehouse: String, rel: String, keys: String*) =
    new MergeTable(s"$warehouse/$rel", keys)

  private def read(spark: SparkSession, warehouse: String, rel: String,
                   schema: StructType, keys: String*): DataFrame =
    t(warehouse, rel, keys: _*).read(spark, schema)

  /** `load_stg`: land the source snapshot. Deliveries carry their business
    * key out of the payload so the SCD0 landing can dedup re-deliveries
    * without parsing (`sql/DDL_stg.deliverysystem_deliveries.sql:12`).
    *
    * A payload with NO extractable delivery_id gets a deterministic
    * surrogate key (`_malformed_<md5(payload)>`): the landing key must be
    * non-null or [[Merge]]'s equality joins mishandle it twice over —
    * `dropDuplicates` would collapse ALL malformed rows to one (losing
    * them before quarantine can record them) and the left-anti replay
    * guard would never match, re-appending the row on every task retry.
    * Downstream, `parseDeliveries` re-extracts NULL from the payload and
    * the S7 `delivery_key_not_null` check quarantines the row with its
    * reason — the disposition the reference's NOT NULL DDL enforces by
    * aborting.
    */
  def loadStg(spark: SparkSession, warehouse: String, sourceDir: String): Unit = {
    val couriers = spark.read.parquet(s"$sourceDir/couriers")
    val deliveries = spark.read.parquet(s"$sourceDir/deliveries")
      .withColumn("delivery_key", coalesce(
        get_json_object(col("json_response"), "$.delivery_id"),
        concat(lit("_malformed_"), md5(col("json_response")))))
      .select(col("json_response"), col("delivery_key"), col("delivery_ts"))
    t(warehouse, "stg/couriers", "courier_key").upsert(couriers)
    t(warehouse, "stg/deliveries", "delivery_key").insertIgnore(deliveries)
  }

  /** `stg_to_dds`: one watermark increment against durable DDS state. */
  def stgToDds(spark: SparkSession, warehouse: String): Unit = {
    val dds = Pipeline.DdsState(
      read(spark, warehouse, "dds/dm_couriers", dmCourierSchema, "courier_key"),
      read(spark, warehouse, "dds/dm_timestamps", dmTimestampSchema, "ts"),
      read(spark, warehouse, "dds/fct_deliveries", fctSchema, "delivery_key"))
    val wm = State.readWatermark(spark, s"$warehouse/state/wf", WorkflowKey,
      Pipeline.coldStartWatermark)
    // stage boundary: the load runs ~6 actions over the parsed increment;
    // materialize the parse ONCE to scratch parquet so each action reads
    // the compact columns instead of re-scanning STG + re-running
    // from_json (the Validate.split caller contract)
    val parsedDir = TempDirs.scratch("graft_pm_parsed_")
    // the watermark cursor and the increment size RIDE the write action
    // (Dataset.observe): at 100 TB a separate agg(max)/isEmpty pass over
    // the increment is a second full scan for two scalars
    val obs = org.apache.spark.sql.Observation(s"parsed_increment_$WorkflowKey")
    StgToDds.parseDeliveries(
        read(spark, warehouse, "stg/deliveries", stgDeliverySchema, "delivery_key")
          .filter(col("delivery_ts") > lit(wm)))
      .observe(obs, max(col("ts")).as("max_ts"), count(lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(parsedDir)
    val incrementMaxTs = Option(obs.get("max_ts"))
      .map(_.asInstanceOf[java.sql.Timestamp])
    // the guard's row count comes from the COMMITTED files' footers, not
    // the observe metric: observed counts can skew under speculative /
    // retried tasks (driver ADVICE), while footer counts describe exactly
    // what the write landed. max_ts stays on observe — max is
    // retry-insensitive, and re-deriving it would be a data scan.
    // An unreadable footer reports rowCount = -1; summing that would
    // UNDERCOUNT and could zero out the guard below, re-enabling the very
    // data loss it prevents — so any unreadable footer makes the footer
    // count unknown and the observe metric (an overcount at worst, which
    // only makes the guard stricter) takes over.
    val incrementRows = {
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(parsedDir))
      val parts = try ls.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".") && java.nio.file.Files.isRegularFile(p)
      }.toSeq finally ls.close()
      val conf = spark.sessionState.newHadoopConf()
      val counts = parts.map(p => graft.lake.FileStats.read(p, conf).rowCount)
      if (counts.exists(_ < 0L)) obs.get("n_rows").asInstanceOf[Long]
      else counts.sum
    }
    val parsed = spark.read.parquet(parsedDir)
    val dmOrders = read(spark, warehouse, "dds/dm_orders", dmOrderSchema, "order_key")
    // misconfiguration guard: an unseeded order dim would inner-join every
    // fact away AND advance the cursor — silently consuming the increment
    // forever. Fail loudly instead.
    if (dmOrders.isEmpty && incrementRows > 0)
      throw new IllegalStateException(
        s"$warehouse/dds/dm_orders is empty but the increment is not — seed the " +
          "pre-existing order dimension (PipelineMain.seedOrders) before loading facts")
    val result = Pipeline.incrementalLoadParsed(parsed,
      read(spark, warehouse, "stg/couriers", stgCourierSchema, "courier_key"),
      dmOrders, dds, maxTsHint = Some(incrementMaxTs))
    // dims merged by BUSINESS KEY (dim-sized full states); facts commit
    // ONLY this increment's rows — an O(increment) incoming side
    t(warehouse, "dds/dm_couriers", "courier_key").upsert(result.dds.dmCouriers)
    t(warehouse, "dds/dm_timestamps", "ts").upsert(result.dds.dmTimestamps)
    t(warehouse, "dds/fct_deliveries", "delivery_key").insertIgnore(result.newFacts)
    // quarantine idempotence cannot key on delivery_key (the rows this
    // table exists for may have it NULL): key on a deterministic row
    // digest so a crash-replay upserts, never duplicates
    val quarantined = result.quarantined.withColumn("_q_key",
      md5(to_json(struct(result.quarantined.columns.map(col): _*))))
    if (!quarantined.isEmpty)
      t(warehouse, "dds/quarantine", "_q_key").upsert(quarantined)
    // the cursor advances LAST — a crash above replays into idempotent merges
    State.advanceWatermark(spark, s"$warehouse/state/wf", WorkflowKey, result.watermark)
  }

  /** `ledger_update`: DDS → CDM full recompute, upserted by the mart key. */
  def ledgerUpdate(spark: SparkSession, warehouse: String): Unit = {
    val dds = Pipeline.DdsState(
      read(spark, warehouse, "dds/dm_couriers", dmCourierSchema, "courier_key"),
      read(spark, warehouse, "dds/dm_timestamps", dmTimestampSchema, "ts"),
      read(spark, warehouse, "dds/fct_deliveries", fctSchema, "delivery_key"))
    val ledger = Pipeline.ledgerRebuild(dds,
      read(spark, warehouse, "dds/dm_orders", dmOrderSchema, "order_key"))
    t(warehouse, "cdm/ledger", "courier_id", "settlement_year", "settlement_month")
      .upsert(ledger)
  }

  /** Seed helper: the pre-existing `dds.dm_orders` dimension. */
  def seedOrders(spark: SparkSession, warehouse: String, dmOrders: DataFrame): Unit =
    t(warehouse, "dds/dm_orders", "order_key").upsert(dmOrders)

  def runStage(spark: SparkSession, stage: String, warehouse: String,
               sourceDir: Option[String] = None): Unit = stage match {
    case "load_stg"      => loadStg(spark, warehouse, sourceDir.getOrElse(
      throw new IllegalArgumentException("load_stg needs <sourceDir>")))
    case "stg_to_dds"    => stgToDds(spark, warehouse)
    case "ledger_update" => ledgerUpdate(spark, warehouse)
    case other => throw new IllegalArgumentException(
      s"unknown stage '$other' (expected load_stg | stg_to_dds | ledger_update)")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PipelineMain <load_stg|stg_to_dds|ledger_update> <warehouse> [sourceDir]")
    val spark = SparkSession.builder()
      .appName(s"graft-${args(0)}")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try runStage(spark, args(0), args(1), args.lift(2))
    finally spark.stop()
  }
}
