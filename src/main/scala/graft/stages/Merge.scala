package graft.stages

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
