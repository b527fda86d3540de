package graft.lake

import java.nio.file.{Files, Path}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{InternalRow, ProjectingInternalRow}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.stages.MergeTable

/** A catalog table backed by MergeTable versioned-parquet storage.
  *
  * The design splits responsibilities the way real lakehouse connectors
  * do: PARQUET I/O is delegated to Spark's own DSv2 parquet
  * implementation — scans come from [[ParquetTable.newScanBuilder]]
  * (vectorized reader, filter pushdown, column pruning, the exact code
  * path `spark.read.parquet` uses), and writes come from its
  * `WriteBuilder`, so data files are written BY THE EXECUTORS with the
  * normal file-commit protocol. What this class adds is the TRANSACTION:
  * every write lands in a per-statement staging directory, and commit
  * promotes the staged files to a new immutable `v<n>` through the
  * MergeTable lock + compare-and-swap pointer flip ([[MergeTable
  * .commitStagedFiles]]). Appends carry the previous version's files
  * forward by hard link — O(files) metadata, no data rewrite.
  *
  * SQL `MERGE INTO` / `UPDATE` / `DELETE` run through Spark's group-based
  * row-level-operation API ([[SupportsRowLevelOperations]]): Catalyst
  * rewrites the statement into a join that computes the surviving rows
  * ([[org.apache.spark.sql.catalyst.plans.logical.ReplaceData]]), and the
  * connector replaces the scanned group. Groups are PER FILE: the
  * statement's WHERE reaches the group scan as pushed filters and prunes
  * files by footer min/max ([[FileStats]]); with
  * `graft.filter.columns` declared, Spark's runtime group filtering
  * additionally narrows MERGE to the files whose key ranges intersect
  * the matched rows ([[org.apache.spark.sql.connector.read
  * .SupportsRuntimeFiltering]]). Files the scan did not read are carried
  * into the new version by hard link — at 100 TB a point MERGE rewrites
  * a handful of files, not the table. Each operation captures its base
  * version at planning time and the commit CAS-checks it, so two
  * concurrent MERGEs cannot silently lose one side's rewrite — the loser
  * throws and nothing is committed (snapshot isolation with conflict
  * detection, the same contract Delta/Iceberg give).
  */
final class GraftTable(tableName: String, dir: Path, tableSchema: StructType,
                       pinnedVersion: Option[String],
                       tableProps: Map[String, String] = Map.empty)
  extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations
  with SupportsDelete {

  private[lake] val merge = new MergeTable(dir.toString, Seq.empty)

  /** Columns Spark's runtime group filtering may prune files on (the
    * MERGE keys, typically) — bounded-cardinality by contract, since the
    * runtime filter materializes their distinct matched values. The
    * unbounded-cardinality alternative is a `_file` metadata column
    * (Iceberg's design); with data clustered on the key (z-order or a
    * range-partitioned write), key-range pruning hits the same files.
    */
  private[lake] val filterColumns: Seq[String] =
    tableProps.get(GraftTable.FilterColumnsProp)
      .map(GraftTable.parseFilterColumns).getOrElse(Nil)

  /** Per-file bloom sidecars present under `_BLOOM/`, loaded once per
    * statement-scoped table instance (the catalog constructs a fresh
    * GraftTable per resolution, so a rebuilt index is picked up by the
    * next statement). Missing/unparsable sidecars mean "no index" —
    * pruning degrades, correctness does not.
    */
  private[lake] lazy val bloomIndex: Map[String, GraftBloomIndex.ColIndex] =
    tableSchema.fields.iterator.map(_.name.toLowerCase(java.util.Locale.ROOT))
      .flatMap(c => GraftBloomIndex.load(dir.toString, c).map(c -> _)).toMap

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def properties(): util.Map[String, String] =
    (tableProps ++ Map(TableCatalog.PROP_LOCATION -> dir.toString,
      "format" -> "graft/parquet-versioned")).asJava

  /** The directory a snapshot reads: a committed version, or a real (but
    * empty) directory for a table no write ever committed — Spark's file
    * index then resolves zero files under the declared schema.
    */
  private[lake] def dataDir(version: Option[String]): String = version match {
    case Some(v) => dir.resolve(v).toString
    case None =>
      val empty = dir.resolve("_empty")
      Files.createDirectories(empty)
      empty.toString
  }

  /** Spark's own parquet DSv2 table over the given paths — the delegation
    * point for all file I/O.
    */
  private[lake] def parquetTable(paths: Seq[String]): ParquetTable =
    ParquetTable(tableName, SparkSession.active, CaseInsensitiveStringMap.empty(),
      paths, Some(tableSchema), classOf[ParquetFileFormat])

  /** The catalog scan. A pinned (time-travel) scan always reads the bare
    * immutable snapshot. The CURRENT-version scan must anti-apply any
    * pending merge-on-read deletes: while a DV sidecar is pending, the
    * delegated parquet scan is wrapped with the pending DELETEs' own
    * predicates ([[DeleteVectors]]) — the read tax the reconcile clears.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val plainBuilder =
      parquetTable(Seq(dataDir(pinnedVersion.orElse(merge.currentVersion))))
        .newScanBuilder(options)
    if (pinnedVersion.isDefined) plainBuilder
    else merge.pendingDeleteVectors match {
      case None => plainBuilder
      case Some(dvDir) =>
        val preds = DeleteVectors.readPredicates(dvDir)
        if (preds.isEmpty) throw new IllegalStateException(
          s"$tableName: pending deletion-vector sidecar $dvDir carries no scan " +
            "predicates (written outside the SQL DELETE path) — run " +
            "reconcileDeletes before reading through the catalog")
        // validate bindability NOW (scan build runs later, deep in planning)
        DeleteVectors.deletedExpr(preds, tableSchema)
        new DvPendingScanBuilder(this, dataDir(merge.currentVersion), preds)
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"$tableName VERSION AS OF ${pinnedVersion.get} is an immutable snapshot — writes go to the current table")
    new GraftWriteBuilder(this, info)
  }

  override def newRowLevelOperationBuilder(info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(pinnedVersion.isEmpty,
      s"$tableName VERSION AS OF ${pinnedVersion.get} is an immutable snapshot — writes go to the current table")
    // no pending-DV check HERE: Spark builds the row-level plan during
    // ANALYSIS for every DELETE, including ones the optimizer later swaps
    // to the SupportsDelete (metadata/DV) path — the check runs when the
    // rewrite actually starts writing (GraftWrite.toBatch)
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new GraftRowLevelOperation(GraftTable.this, info)
    }
  }

  // ---- metadata-only DELETE ----------------------------------------------
  // The partition-drop equivalent: when footer stats prove every file is
  // either all-match (drop it) or no-match (carry it), the DELETE commits
  // a new version without reading a single data row — Spark's
  // OptimizeMetadataOnlyDeleteFromTable consults canDeleteWhere and swaps
  // the row-level rewrite out for this path. Any boundary-straddling file
  // makes the statement fall back to the (file-pruned) rewrite.

  /** The drop set, or None when some file straddles the condition.
    * Paired with the base version so the commit CAS-pins the snapshot the
    * decision was computed against. The last answer is memoized per
    * filter set: Spark consults `canDeleteWhere` (sometimes more than
    * once — EXPLAIN, then the optimizer) before `deleteWhere`, and each
    * uncached answer costs an O(files) footer pass; staleness is covered
    * by the commit's CAS, not the cache.
    */
  @volatile private var deletePlanMemo
      : (Seq[org.apache.spark.sql.sources.Filter], Option[(Option[String], Set[String])]) = null

  private def metadataDeletePlan(filters: Array[org.apache.spark.sql.sources.Filter])
      : Option[(Option[String], Set[String])] = {
    val key = filters.toSeq
    val memo = deletePlanMemo
    if (memo != null && memo._1 == key) return memo._2
    val plan = merge.currentVersion match {
      case None => Some((Option.empty[String], Set.empty[String])) // empty table: trivially metadata-only
      case Some(base) =>
        val files = merge.dataFiles(base)
        // manifest-first: one small JSON read instead of O(files) footer
        // opens; footer reads survive only as the per-file fallback
        val stats = StatsManifest.statsFor(dir.resolve(base), files,
          SparkSession.active.sessionState.newHadoopConf())
        val bloom = bloomIndex
        val drop = Set.newBuilder[String]
        val decidable = files.forall { f =>
          val st = stats(f.getFileName.toString)
          if (FileStats.mustMatchAll(st, key)) { drop += f.getFileName.toString; true }
          else !FileStats.mightMatch(st, key) ||
            // bloom no-match proof: a point-delete key absent from the
            // file makes it a clean carry even when footer ranges overlap
            !key.forall(GraftBloomIndex.mightMatch(bloom, tableSchema,
              f.getFileName.toString, _))
        }
        if (decidable) Some((Some(base), drop.result())) else None
    }
    deletePlanMemo = (key, plan)
    plan
  }

  // ---- DELETE decision ladder --------------------------------------------
  // The ladder a real lakehouse runs (Delta's, with DV opt-in):
  //   1. metadata-only when footer stats PROVE whole files drop — zero
  //      data I/O (skipped while a DV sidecar is pending: its commit
  //      could not carry the sidecar forward);
  //   2. deletion vector when the table opts in (graft.dv.delete.maxRows)
  //      and the hit set is small — O(deleted rows) sidecar, NO version
  //      commit, the scan pays the anti-apply until reconcile;
  //   3. group rewrite otherwise (canDeleteWhere = false → Spark's
  //      row-level operation path).
  // The eligibility row count is one pushed-filter scan, memoized like
  // the metadata plan (Spark consults canDeleteWhere more than once).

  import GraftTable.{DeleteDecision, DvAppend, MetaOnly, NothingToDelete, Rewrite}

  /** DV opt-in: max matching rows a DELETE may divert to the sidecar.
    * Absent/unparsable = DV mode off (every non-metadata DELETE rewrites).
    */
  private[lake] def dvDeleteMaxRows: Option[Long] =
    tableProps.get(GraftTable.DvDeleteMaxRowsProp)
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption).filter(_ >= 0)

  @volatile private var deleteDecisionMemo
      : (Seq[org.apache.spark.sql.sources.Filter], DeleteDecision) = null

  private def deleteDecision(filters: Array[org.apache.spark.sql.sources.Filter])
      : DeleteDecision = {
    val key = filters.toSeq
    val memo = deleteDecisionMemo
    if (memo != null && memo._1 == key) return memo._2
    val pendingDv = merge.pendingDeleteVectors.isDefined
    val decision = merge.currentVersion match {
      case None => NothingToDelete
      case Some(base) =>
        metadataDeletePlan(filters) match {
          case Some((b, drop)) if !pendingDv => MetaOnly(b, drop)
          case _ =>
            dvDeleteMaxRows match {
              case Some(cap) if DeleteVectors.translatable(filters, tableSchema) =>
                val pred = filters.flatMap(DeleteVectors.filterToColumn)
                  .reduceLeft(_ && _)
                val n = SparkSession.active.read.schema(tableSchema)
                  .parquet(dataDir(Some(base))).filter(pred).count()
                if (n == 0) NothingToDelete
                else if (n <= cap) DvAppend(n)
                else Rewrite
              case _ => Rewrite
            }
        }
    }
    deleteDecisionMemo = (key, decision)
    decision
  }

  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    pinnedVersion.isEmpty && (deleteDecision(filters) match {
      case Rewrite => false
      case _       => true
    })

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(pinnedVersion.isEmpty,
      s"$tableName VERSION AS OF ${pinnedVersion.get} is an immutable snapshot — writes go to the current table")
    deleteDecision(filters) match {
      case NothingToDelete => () // empty table or zero matching rows
      case MetaOnly(base, drop) =>
        // an empty staging dir + carry-forward of everything not dropped:
        // O(files) link metadata, zero data I/O
        val stage = dir.resolve(s"_stage_metadel_${java.util.UUID.randomUUID()}")
        Files.createDirectories(stage)
        merge.commitStagedFiles(stage, carryForward = true,
          expectedBase = Some(base), carryExclude = drop)
      case DvAppend(_) =>
        // merge-on-read: positions into the sidecar, the statement's
        // filters beside them for the scan-side anti-apply; NO commit
        val pred = filters.flatMap(DeleteVectors.filterToColumn).reduceLeft(_ && _)
        merge.deleteVectors(SparkSession.active, pred)
        merge.pendingDeleteVectors.foreach(dvDir =>
          DeleteVectors.writePredicates(dvDir, filters))
      case Rewrite => throw new IllegalStateException(
        s"$tableName: deleteWhere called for a condition canDeleteWhere rejects — " +
          "a concurrent commit changed the file set; re-run the statement")
    }
  }
}

object GraftTable {
  /** Comma-separated table property: the columns runtime group filtering
    * may prune row-level-operation file groups on.
    */
  val FilterColumnsProp = "graft.filter.columns"

  /** Table property opting `DELETE` into merge-on-read deletion vectors:
    * the maximum matching-row count a DELETE may divert to the sidecar
    * (above it, the group rewrite is the better trade — Delta's small-
    * delete heuristic as an explicit knob). Absent = copy-on-write only.
    */
  val DvDeleteMaxRowsProp = "graft.dv.delete.maxRows"

  private[lake] sealed trait DeleteDecision
  private[lake] case object NothingToDelete extends DeleteDecision
  private[lake] final case class MetaOnly(base: Option[String], drop: Set[String]) extends DeleteDecision
  private[lake] final case class DvAppend(nRows: Long) extends DeleteDecision
  private[lake] case object Rewrite extends DeleteDecision

  /** THE parse of [[FilterColumnsProp]] — shared by the table (to act on
    * it) and the catalog's validation (to reject typos), so the two can
    * never drift apart.
    */
  def parseFilterColumns(value: String): Seq[String] =
    value.split(',').map(_.trim).filter(_.nonEmpty).toSeq
}

/** INSERT INTO (append) / INSERT OVERWRITE (truncate): mode is decided by
  * the analyzer calling [[truncate]].
  */
private[lake] final class GraftWriteBuilder(table: GraftTable, info: LogicalWriteInfo)
  extends WriteBuilder with SupportsTruncate {
  private var replace = false
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write =
    new GraftWrite(table, info, carryForward = !replace, expectedBase = None)
}

/** Group-based row-level operation with PER-FILE groups: the scan
  * exposes only the base-snapshot files that might hold matching rows,
  * the write replaces exactly those files (the rest are carried forward
  * by hard link), and the commit CAS-checks that the snapshot is still
  * current. One instance serves both the read and the write side of a
  * single MERGE/UPDATE/DELETE statement — the write reads the file set
  * the scan settled on, so the two sides cannot disagree about what was
  * replaced.
  *
  * Two pruning layers, both conservative (a file is only skipped when
  * its footer PROVES no row can match):
  *   1. static — Spark pushes the statement's WHERE into this scan for
  *      group pruning; [[FileStats.mightMatch]] evaluates it against
  *      footer min/max at plan time;
  *   2. runtime — for conditions that need the source side (MERGE's ON),
  *      [[SupportsRuntimeFiltering]] receives `IN` predicates over
  *      `graft.filter.columns` built from the actually-matched rows, and
  *      the file set narrows again before execution.
  */
private[lake] final class GraftRowLevelOperation(table: GraftTable, info: RowLevelOperationInfo)
  extends RowLevelOperation {
  // the snapshot this statement plans against, captured ONCE — both the
  // rewrite join's scan and the commit's conflict check use it
  private val base: Option[String] = table.merge.currentVersion
  private val baseFiles: Seq[Path] = base.toSeq.flatMap(v => table.merge.dataFiles(v))

  /** The files the rewrite replaces — everything else is carried. Starts
    * at "all of them" (whole-table replace) and only ever narrows as the
    * group scan prunes; read by the write at commit time. The scan is
    * built once (by Spark's row-level scan planning) and executes before
    * the write commits, so the set is settled when it is read.
    */
  @volatile private[lake] var replacedFiles: Set[String] =
    baseFiles.map(_.getFileName.toString).toSet

  // per-file stats, loaded lazily once per statement and shared by the
  // static and runtime pruning passes — manifest-first (`_STATS`, written
  // at commit time), with per-file footer reads only as the fallback for
  // versions that predate the manifest
  private lazy val stats: Map[String, FileStats.FileStat] = base match {
    case Some(v) => StatsManifest.statsFor(
      java.nio.file.Paths.get(table.merge.root, v), baseFiles,
      SparkSession.active.sessionState.newHadoopConf())
    case None => Map.empty
  }

  /** Two independent no-match proofs, both conservative: footer min/max
    * ranges ([[FileStats]]) and, where a `_BLOOM` sidecar covers the
    * column, per-file bloom membership of point predicates — which is
    * what still prunes when the table is unclustered in the key and every
    * footer range spans the whole domain.
    */
  private[lake] def prune(files: Seq[Path],
                          filters: Array[org.apache.spark.sql.sources.Filter]): Seq[Path] =
    if (filters.isEmpty) files
    else files.filter { f =>
      val name = f.getFileName.toString
      FileStats.mightMatch(stats(name), filters.toSeq) &&
        filters.forall(GraftBloomIndex.mightMatch(table.bloomIndex, table.schema(), name, _))
    }

  override def command(): RowLevelOperation.Command = info.command()

  /** The group scan builder. It accepts pushed filters but reports ALL of
    * them as residual — Spark pushes the statement's WHERE here for GROUP
    * pruning, expecting group granularity: rows of a surviving group that
    * don't match must still be read (they are the "copy" side of the
    * rewrite). A scan that honored the filter at ROW granularity (as the
    * vectorized parquet scan does) would silently DELETE every
    * non-matching row of a rewritten group. Iceberg's row-level scans
    * make the same choice: filters prune FILES, never rows — which is
    * exactly what [[GraftRowLevelOperation.prune]] does with them.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters {
      private var groupFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty
      override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter]) = {
        groupFilters = filters
        filters // all residual: filters prune files here, never rows
      }
      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = Array.empty
      override def build(): Scan =
        if (table.filterColumns.nonEmpty)
          new RuntimeFilterableGroupScan(prune(baseFiles, groupFilters))
        else new GroupScan(prune(baseFiles, groupFilters))
    }

  /** The group scan: full rows of the current candidate file set. The
    * set may narrow between planning and execution (runtime filtering
    * subclass); `toBatch` re-plans from the live set on every call
    * (Spark calls it again after `filter`), and every narrowing is
    * mirrored into [[replacedFiles]] for the write side.
    */
  private sealed class GroupScan(initial: Seq[Path]) extends Scan {
    @volatile protected var current: Seq[Path] = initial
    record()

    protected def record(): Unit =
      replacedFiles = current.map(_.getFileName.toString).toSet

    override def readSchema(): StructType = table.schema()

    override def toBatch: org.apache.spark.sql.connector.read.Batch =
      table.parquetTable(
        if (current.isEmpty) Seq(table.dataDir(None)) else current.map(_.toString))
        .newScanBuilder(CaseInsensitiveStringMap.empty()).build().toBatch

    override def description(): String =
      s"GraftGroupScan(${table.name()}, base=${base.getOrElse("∅")}, " +
        s"files=${current.size}/${baseFiles.size})"
  }

  /** Runtime group filtering (only offered when the table declares
    * `graft.filter.columns` — an empty attribute list would make the
    * planner rule a no-op at best). Spark builds the matched-row set
    * through a REGULAR scan of the original table, collects the distinct
    * filter-column values, and hands them here as `IN` predicates before
    * execution starts.
    */
  private final class RuntimeFilterableGroupScan(initial: Seq[Path])
    extends GroupScan(initial)
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

    override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      table.filterColumns.map(org.apache.spark.sql.connector.expressions.Expressions.column).toArray

    override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
      current = prune(current, filters)
      record()
    }
  }

  override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GraftWrite(table, writeInfo, carryForward = true,
          expectedBase = Some(base), carryExclude = () => replacedFiles)
    }

  override def description(): String =
    s"GraftRowLevelOperation(${info.command()}, base=${base.getOrElse("∅")})"
}

/** The shared physical write: executors stream rows through Spark's
  * parquet `BatchWrite` into a fresh staging directory; the driver-side
  * commit promotes the staged files with the MergeTable CAS flip. Abort
  * tears the staging down and commits nothing.
  */
private[lake] final class GraftWrite(table: GraftTable, info: LogicalWriteInfo,
                                     carryForward: Boolean,
                                     expectedBase: Option[Option[String]],
                                     carryExclude: () => Set[String] = () => Set.empty) extends Write {
  override def description(): String =
    s"GraftWrite(${table.name()}, ${if (carryForward) "append" else "replace"})"

  override def toBatch: BatchWrite = {
    // fail BEFORE executors write, not at the commit: any staged commit
    // built from the bare version would resurrect pending merge-on-read
    // deletes (the MergeTable commit guard is the backstop). Checked at
    // execution time, not plan time — analysis builds this write for
    // DELETE plans the optimizer later swaps to the DV/metadata path.
    require(table.merge.pendingDeleteVectors.isEmpty,
      s"${table.name()} has pending merge-on-read deletes — run " +
        "reconcileDeletes before MERGE/UPDATE/INSERT/rewrite-DELETE")
    val stage = java.nio.file.Paths.get(
      table.dataDir(None)).getParent.resolve(s"_stage_dsv2_${java.util.UUID.randomUUID()}")
    Files.createDirectories(stage)
    val inner = table.parquetTable(Seq(stage.toString))
      .newWriteBuilder(info).build().toBatch

    new BatchWrite {
      override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
        new DataSchemaAdaptingWriterFactory(
          inner.createBatchWriterFactory(pi), info.schema())
      override def useCommitCoordinator: Boolean = inner.useCommitCoordinator
      override def onDataWriterCommit(message: WriterCommitMessage): Unit =
        inner.onDataWriterCommit(message)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        inner.commit(messages)   // file-commit protocol: task files -> stage dir
        table.merge.commitStagedFiles(stage, carryForward, expectedBase, carryExclude())
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        try inner.abort(messages)
        finally if (Files.exists(stage)) graft.stages.TempDirs.deleteTree(stage)
    }
  }
}

/** Adapts incoming rows to the write schema when Spark's row-level
  * rewrite hands the writer WIDER rows than the declared write schema.
  *
  * Group-based `ReplaceData` plans prepend a `__row_operation` column
  * (copy/update/delete marker, used for operation metrics) to the
  * replacement rows, while `LogicalWriteInfo.schema()` stays the data
  * schema; the executor-side projection that strips it is only applied on
  * the metadata-attribute write path
  * (`DataAndMetadataWritingSparkTask`) — a connector whose operation
  * requests no metadata columns receives the raw wide rows. This wrapper
  * restores the invariant the parquet writer needs: if a row is wider
  * than the write schema, the leading extra columns are dropped via a
  * reusable [[ProjectingInternalRow]]; rows already matching the schema
  * pass through untouched, so the adapter is a no-op if a future Spark
  * applies the data projection itself.
  */
private[lake] final class DataSchemaAdaptingWriterFactory(
    inner: DataWriterFactory, dataSchema: StructType) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val w = inner.createWriter(partitionId, taskId)
    new DataWriter[InternalRow] {
      private var proj: ProjectingInternalRow = null
      override def write(row: InternalRow): Unit =
        if (row.numFields == dataSchema.length) w.write(row)
        else {
          if (proj == null) {
            val offset = row.numFields - dataSchema.length
            require(offset > 0, s"row has ${row.numFields} fields for ${dataSchema.length}-column schema")
            proj = ProjectingInternalRow(dataSchema, offset until row.numFields)
          }
          proj.project(row)
          w.write(proj)
        }
      override def commit(): WriterCommitMessage = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
      override def currentMetricsValues() = w.currentMetricsValues()
    }
  }
}
