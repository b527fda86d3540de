package graft.stages

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Workflow watermark state — the reference's `srv_wf_settings` tables
  * (`modules/load_deliveries.py:28-38`, `sql/deliveries_stg_to_dds.sql:45-56`):
  * one `(workflow_key, last_loaded_ts)` row per workflow, read with a
  * default fallback, conditionally advanced after a successful load.
  *
  * Stored as a tiny [[MergeTable]] rooted at `path` (one upsert per
  * advance): the cursor flip inherits the table's crash-safe pointer-flip
  * commit — a writer dying mid-advance leaves the PREVIOUS cursor intact
  * and readable, never a deleted/half-written state table (the failure
  * mode of a plain `mode(Overwrite)` parquet write, which deletes before
  * it writes) — plus versioned cursor history for audit. Reads/writes are
  * driver-cheap (a handful of rows); the scalar watermark is collected
  * driver-side and pushed into scans as a literal predicate — exactly the
  * reference's scalar subquery (`sql/deliveries_stg_to_dds.sql:13-16`)
  * resolved once per run. Pushing a literal (not a join) means the fact
  * scan gets a parquet PushedFilter and partition pruning at any scale.
  *
  * Atomicity note (SURVEY.md §7.3): the reference advances the watermark in
  * the same Postgres transaction as the data insert. Spark has no
  * cross-table transaction, so the contract here is write-data-first,
  * advance-watermark-second; replays are converged by the idempotent
  * [[Merge]] operations.
  */
object State {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("workflow_key",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("last_loaded_ts",
      org.apache.spark.sql.types.TimestampType)))

  private def table(path: String) = new MergeTable(path, Seq("workflow_key"))

  /** Read the watermark for `workflowKey`, falling back to `default` —
    * `coalesce((select …), default)` in the reference.
    */
  def readWatermark(spark: SparkSession, path: String, workflowKey: String,
                    default: Timestamp): Timestamp = {
    val rows = table(path).read(spark, schema)
      .filter(col("workflow_key") === workflowKey)
      .select(col("last_loaded_ts")).collect()
    rows.headOption.map(_.getTimestamp(0)).getOrElse(default)
  }

  /** Advance the watermark only when the increment was non-empty
    * (`where last_loaded_ts is not null`, `sql/deliveries_stg_to_dds.sql:54`;
    * count guard at `modules/load_deliveries.py:66-70`). Upsert-by-key so
    * other workflows' cursors survive.
    */
  def advanceWatermark(spark: SparkSession, path: String, workflowKey: String,
                       newTs: Option[Timestamp]): Unit = newTs.foreach { ts =>
    import spark.implicits._
    table(path).upsert(Seq((workflowKey, ts)).toDF("workflow_key", "last_loaded_ts"))
  }
}
