package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{coalesce, col, concat_ws, lag, lead, lit}

/** SCD upsert semantics re-expressed as pure DataFrame algebra.
  *
  * The reference gets upserts from Postgres unique-index arbitration
  * (`INSERT … ON CONFLICT`, `modules/load_couriers.py:44-47`,
  * `modules/load_deliveries.py:60-62`). Spark has no in-place mutation of
  * parquet, so both flavors become anti-join + union rewrites — the classic
  * MERGE decomposition that lakehouse engines run under the hood:
  *
  *   - SCD1 upsert  (couriers, `sql/couriers_stg_to_dds.sql:21-27`):
  *     matched rows are REPLACED by the incoming version.
  *   - SCD0 insert-ignore (facts/timestamps,
  *     `sql/deliveries_stg_to_dds.sql:38-43`): matched rows are KEPT,
  *     only unseen keys are appended.
  *
  * Scale: the anti-join shuffles both sides on the business key — the same
  * exchange a storage-level MERGE would do. With the target table bucketed by
  * key (or Delta/Iceberg MERGE where available) the existing side's shuffle
  * disappears; the rewrite here is storage-format-neutral. Both operations
  * are idempotent — replaying a batch converges to the same table, which is
  * what makes write-then-advance-watermark safe without a cross-system
  * transaction (SURVEY.md §7.3).
  */
object Merge {

  /** SCD1: incoming wins on key collision; existing rows without a matching
    * incoming key survive unchanged. `incoming` must be unique per key
    * (mirror of the reference's UNIQUE(courier_key) contract) — enforce
    * upstream with dropDuplicates if the source can repeat keys.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    existing
      .join(incoming.select(keyCols: _*), keys, "left_anti")
      .unionByName(incoming)
  }

  /** SCD2: versioned dimension history with validity intervals — the one
    * classic SCD flavor the reference does NOT ship (it keeps SCD0 and
    * SCD1 only), completing the family. `existing` carries
    * `keys ++ attrs ++ (effective_from, effective_to, is_current)`;
    * `incoming` carries `keys ++ attrs ++ change_ts`. A changed attribute
    * CLOSES the key's current version at the change time and opens a new
    * one; an unchanged delivery is a no-op (consecutive-duplicate
    * collapse), which also makes replaying a batch idempotent.
    *
    * Shape: delta-sized, not a full-history rewrite — untouched keys are
    * carried forward by one left-anti join; only the keys the batch
    * touches have their version chain rebuilt (union of their existing
    * versions' change points with the batch, one window per key: collapse
    * consecutive equal attribute fingerprints, then `effective_to =
    * lead(effective_from)`). At 100 TB the work is O(touched keys'
    * versions + batch), the same posture as the incremental curation.
    * Ties at one instant order by the attribute fingerprint so rebuilds
    * are deterministic under replay.
    */
  def scd2Upsert(existing: DataFrame, incoming: DataFrame,
                 keys: Seq[String], attrs: Seq[String]): DataFrame = {
    // The fingerprint must be injective over attribute tuples: the U+0001
    // separator keeps ("ab","c") != ("a","bc"), and the U+0000 NULL
    // sentinel keeps ("a",NULL) != (NULL,"a") and NULL != "" -- concat_ws
    // alone SKIPS null arguments, which would collapse a NULL-involving
    // attribute change into a no-op and never open the new version.
    val fp: Column = concat_ws("\u0001",
      attrs.map(a => coalesce(col(a).cast("string"), lit("\u0000null"))): _*)
    val inKeys = incoming.select(keys.map(col): _*).distinct()
    val untouched = existing.join(inKeys, keys, "left_anti")
    val touchedLog = existing.join(inKeys, keys, "left_semi")
      .select((keys ++ attrs).map(col) :+ col("effective_from"): _*)
      .unionByName(incoming
        .select((keys ++ attrs).map(col) :+ col("change_ts").as("effective_from"): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("effective_from"), fp)
    val rebuilt = touchedLog
      .withColumn("_fp", fp)
      .withColumn("_prev", lag(col("_fp"), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col("_fp"))
      .withColumn("effective_to", lead(col("effective_from"), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("_fp", "_prev")
    untouched.unionByName(rebuilt)
  }

  /** SCD0: first write wins; incoming rows whose key already exists are
    * dropped. Also dedupes the incoming batch itself on the key (the
    * reference's per-row loop hits the unique index one row at a time, so
    * in-batch duplicates are ignored too).
    */
  def insertIgnore(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    existing.unionByName(
      incoming
        .dropDuplicates(keys)
        .join(existing.select(keyCols: _*), keys, "left_anti"))
  }
}
