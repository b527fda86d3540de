package graft.stages

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Workflow watermark state — the reference's `srv_wf_settings` tables
  * (`modules/load_deliveries.py:28-38`, `sql/deliveries_stg_to_dds.sql:45-56`):
  * one `(workflow_key, last_loaded_ts)` row per workflow, read with a
  * default fallback, conditionally advanced after a successful load.
  *
  * Stored as a tiny parquet table at `path`. Reads/writes are driver-cheap
  * (a handful of rows); the scalar watermark is collected driver-side and
  * pushed into scans as a literal predicate — exactly the reference's scalar
  * subquery (`sql/deliveries_stg_to_dds.sql:13-16`) resolved once per run.
  * Pushing a literal (not a join) means the fact scan gets a parquet
  * PushedFilter and partition pruning at any scale.
  *
  * Atomicity note (SURVEY.md §7.3): the reference advances the watermark in
  * the same Postgres transaction as the data insert. Spark has no
  * cross-table transaction, so the contract here is write-data-first,
  * advance-watermark-second; replays are converged by the idempotent
  * [[Merge]] operations.
  */
object State {

  /** Read the watermark for `workflowKey`, falling back to `default` —
    * `coalesce((select …), default)` in the reference.
    */
  def readWatermark(spark: SparkSession, path: String, workflowKey: String,
                    default: Timestamp): Timestamp = {
    val existing = tryReadTable(spark, path)
    existing match {
      case Some(df) =>
        val rows = df.filter(col("workflow_key") === workflowKey)
          .select(col("last_loaded_ts")).collect()
        rows.headOption.map(_.getTimestamp(0)).getOrElse(default)
      case None => default
    }
  }

  /** Advance the watermark only when the increment was non-empty
    * (`where last_loaded_ts is not null`, `sql/deliveries_stg_to_dds.sql:54`;
    * count guard at `modules/load_deliveries.py:66-70`). Upsert-by-key so
    * other workflows' cursors survive.
    */
  def advanceWatermark(spark: SparkSession, path: String, workflowKey: String,
                       newTs: Option[Timestamp]): Unit = newTs.foreach { ts =>
    import spark.implicits._
    val incoming = Seq((workflowKey, ts)).toDF("workflow_key", "last_loaded_ts")
    val merged = tryReadTable(spark, path) match {
      case Some(existing) =>
        // materialize before overwriting the path we just read
        val kept = existing.filter(col("workflow_key") =!= workflowKey).collect()
        val keptDf = spark.createDataFrame(
          spark.sparkContext.parallelize(kept.toSeq), existing.schema)
        keptDf.unionByName(incoming)
      case None => incoming
    }
    merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  private def tryReadTable(spark: SparkSession, path: String): Option[DataFrame] =
    try {
      val df = spark.read.parquet(path)
      Some(df)
    } catch { case _: Exception => None }
}
