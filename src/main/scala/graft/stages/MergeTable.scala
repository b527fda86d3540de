package graft.stages

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** A versioned parquet MERGE target — the storage-transactional upsert the
  * reference gets from a single Postgres transaction
  * (`sql/deliveries_stg_to_dds.sql:38-56`), re-expressed for immutable
  * columnar storage without requiring Delta/Iceberg jars.
  *
  * Protocol (the same pointer-flip idea lakehouse formats use):
  *   1. every merge computes `existing ⊳⊲ batch` with the [[Merge]]
  *      rewrites and writes it to a brand-new version directory `v<n>`;
  *   2. only after the write fully succeeds is the `_CURRENT` pointer file
  *      replaced — written to a temp name, then ATOMIC_MOVE'd over.
  * A reader resolves `_CURRENT` first, so a crash anywhere before the flip
  * leaves the previous version intact and readable; a half-written `v<n>`
  * is invisible garbage, never corruption. Because the merges themselves
  * are idempotent, re-running a failed batch converges to the same table —
  * together with write-then-advance watermark ordering this is the
  * engine's exactly-once story (SURVEY.md §7.3).
  *
  * The pointer is durable: a new `MergeTable` on the same root resumes
  * from the last committed version (restartability — what the in-memory
  * round-1 sink lacked). On object stores without atomic rename this flip
  * maps onto the store's conditional-put, exactly as Delta's LogStore does.
  */
final class MergeTable(val root: String, keys: Seq[String]) {

  private def pointerPath: Path = Paths.get(root, "_CURRENT")

  /** The committed version directory, if any merge ever committed. */
  def currentVersion: Option[String] =
    if (Files.exists(pointerPath))
      Some(new String(Files.readAllBytes(pointerPath), StandardCharsets.UTF_8).trim)
    else None

  private def currentData(spark: SparkSession): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(Paths.get(root, v).toString))

  def read(spark: SparkSession, schemaIfEmpty: StructType): DataFrame =
    currentData(spark).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schemaIfEmpty))

  /** Time travel: read a specific committed version (`v0`, `v1`, …).
    * Version directories are immutable once written, so any retained
    * version is a consistent snapshot — the same contract Delta's
    * `versionAsOf` exposes.
    */
  def readVersion(spark: SparkSession, version: String): DataFrame =
    spark.read.parquet(Paths.get(root, version).toString)

  /** Drop all committed versions except the newest `keepLast` (never the
    * current one). Old versions are what time travel reads, so retention
    * is a policy knob, not garbage: this is `VACUUM`.
    */
  def vacuum(keepLast: Int = 1): Unit = {
    require(keepLast >= 1, "must keep at least the current version")
    val cur = currentVersion.map(_.drop(1).toLong).getOrElse(return)
    val entries = Files.list(Paths.get(root))
    try entries.forEach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("v") && name.drop(1).forall(_.isDigit) &&
          name.drop(1).toLong <= cur - keepLast) {
        val tree = Files.walk(p)
        try tree.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(Files.delete(_))
        finally tree.close()
      }
    } finally entries.close()
  }

  /** SCD1 merge-commit: incoming wins on key collision. With
    * `evolveSchema`, columns present on only one side are null-filled on
    * the other (additive schema evolution, like `MERGE` with
    * `autoMerge`); without it, a schema drift fails loudly.
    */
  def upsert(batch: DataFrame, evolveSchema: Boolean = false): Unit = commit(batch) {
    case Some(existing) => mergeEvolved(existing, batch, evolveSchema)(
      Merge.upsert(_, _, keys))
    case None           => batch
  }

  /** SCD0 merge-commit: first write wins. */
  def insertIgnore(batch: DataFrame, evolveSchema: Boolean = false): Unit = commit(batch) {
    case Some(existing) => mergeEvolved(existing, batch, evolveSchema)(
      Merge.insertIgnore(_, _, keys))
    case None           => batch.dropDuplicates(keys)
  }

  private def mergeEvolved(existing: DataFrame, batch: DataFrame, evolve: Boolean)
                          (merge: (DataFrame, DataFrame) => DataFrame): DataFrame =
    if (!evolve) merge(existing, batch)
    else {
      import org.apache.spark.sql.functions.{col, lit}
      def widen(df: DataFrame, to: StructType): DataFrame =
        to.fields.foldLeft(df) { (d, f) =>
          if (d.columns.contains(f.name)) d
          else d.withColumn(f.name, lit(null).cast(f.dataType))
        }
      merge(widen(existing, batch.schema), widen(batch, existing.schema))
    }

  private def commit(batch: DataFrame)(merge: Option[DataFrame] => DataFrame): Unit = {
    val spark = batch.sparkSession
    val next = s"v${currentVersion.map(_.drop(1).toLong + 1).getOrElse(0L)}"
    merge(currentData(spark)).write.mode("overwrite")
      .parquet(Paths.get(root, next).toString)
    // flip only after the data write fully succeeded
    val tmp = Paths.get(root, s"_CURRENT.tmp")
    Files.write(tmp, next.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

object MergeTable {
  /** Fresh table rooted in a new temp directory, deleted at JVM exit
    * (tests, scratch targets). Durable tables pass a real root instead.
    */
  def scratch(keys: Seq[String]): MergeTable =
    new MergeTable(TempDirs.scratch("graft_mergetable_"), keys)
}
