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

  /** Type-agnostic timestamp scalar extraction. A collected max-ts probe
    * must tolerate whichever external type the session's reader produced
    * for the row — `java.sql.Timestamp` (TimestampType),
    * `java.time.LocalDateTime` (TIMESTAMP_NTZ: the corpus has shipped
    * event time as naive µs, read as UTC — sessions pin UTC), or
    * `java.time.Instant` (java8 datetime API mode). Null → None.
    */
  def tsValue(row: org.apache.spark.sql.Row, i: Int): Option[Timestamp] =
    if (row.isNullAt(i)) None
    else row.get(i) match {
      case t: Timestamp                 => Some(t)
      case ldt: java.time.LocalDateTime =>
        Some(Timestamp.from(ldt.toInstant(java.time.ZoneOffset.UTC)))
      case inst: java.time.Instant      => Some(Timestamp.from(inst))
      case other => throw new IllegalArgumentException(
        s"not a timestamp scalar: ${other.getClass.getName}")
    }

  /** A state table written by the pre-MergeTable layout: bare parquet part
    * files directly at `path`, no `_CURRENT` pointer. Read transparently
    * (explicit file list — never directory-recursive, so orphan `v*` dirs
    * from a crashed first commit can't confuse partition discovery) and
    * migrated into the versioned table on the first advance — upgrading
    * the storage layout must never silently rewind a cursor to its
    * cold-start default.
    */
  private def legacyTable(spark: SparkSession, path: String) = {
    val parts = Option(new java.io.File(path).listFiles())
      .map(_.filter(f => f.isFile && f.getName.startsWith("part-")
        && f.getName.endsWith(".parquet")))
      .getOrElse(Array.empty[java.io.File])
    if (parts.isEmpty) None
    else Some(spark.read.parquet(parts.map(_.getPath).toSeq: _*))
  }

  /** Read the watermark for `workflowKey`, falling back to `default` —
    * `coalesce((select …), default)` in the reference.
    */
  def readWatermark(spark: SparkSession, path: String, workflowKey: String,
                    default: Timestamp): Timestamp = {
    val t = table(path)
    val df =
      if (t.currentVersion.isDefined) t.read(spark, schema)
      else legacyTable(spark, path).getOrElse(t.read(spark, schema))
    val rows = df.filter(col("workflow_key") === workflowKey)
      .select(col("last_loaded_ts")).collect()
    rows.headOption.flatMap(tsValue(_, 0)).getOrElse(default)
  }

  /** Advance the watermark only when the increment was non-empty
    * (`where last_loaded_ts is not null`, `sql/deliveries_stg_to_dds.sql:54`;
    * count guard at `modules/load_deliveries.py:66-70`). Upsert-by-key so
    * other workflows' cursors survive.
    */
  def advanceWatermark(spark: SparkSession, path: String, workflowKey: String,
                       newTs: Option[Timestamp]): Unit = newTs.foreach { ts =>
    import spark.implicits._
    val t = table(path)
    if (t.currentVersion.isEmpty)
      legacyTable(spark, path).foreach(l =>
        t.upsert(l.select(col("workflow_key"), col("last_loaded_ts"))))
    t.upsert(Seq((workflowKey, ts)).toDF("workflow_key", "last_loaded_ts"))
  }
}
