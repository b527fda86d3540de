package graft.lake

import java.nio.file.{Files, Path}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, BoundReference, EqualNullSafe => CEqualNullSafe, EqualTo => CEqualTo, Expression, GreaterThan => CGreaterThan, GreaterThanOrEqual => CGreaterThanOrEqual, In => CIn, IsNotNull => CIsNotNull, IsNull => CIsNull, LessThan => CLessThan, LessThanOrEqual => CLessThanOrEqual, Literal, Not => CNot, Or => COr, Predicate}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SQL face of merge-on-read DELETE (Delta deletion vectors /
  * Iceberg position deletes), below [[GraftTable]]'s decision ladder.
  *
  * A DV-mode `DELETE` appends the predicate's (file, row-position) hits
  * to the current version's sidecar ([[graft.stages.MergeTable
  * .deleteVectors]]) and commits NO new version — O(deleted rows), zero
  * data rewrite. Until [[graft.stages.MergeTable.reconcileDeletes]]
  * folds the sidecar, the catalog scan must anti-apply the pending
  * deletes. Positions are not reachable from a delegated DSv2 parquet
  * scan (the v2 reader exposes no row-index metadata column), so the
  * scan-side application rides the OTHER exact representation the
  * statement already has: the DELETE's own pushed predicates. They are
  * [[org.apache.spark.sql.sources.Filter]]s — column-vs-literal
  * comparisons, deterministic by construction — and the data files of
  * the version are immutable, so re-evaluating them at scan time marks
  * exactly the rows the sidecar's positions mark. Each DV delete
  * persists its filter array beside the sidecar
  * (`_pred_<uuid>.bin`, underscore-hidden from the parquet position
  * reads); the scan drops rows matching ANY pending predicate.
  *
  * The pending-DV scan is the documented READ TAX: it forces row-based
  * (non-columnar) reads and skips pushdown/pruning until the reconcile
  * — which is why the ladder only chooses DV for SMALL hit sets and why
  * the reconcile census prices how long the tax has been accruing. A
  * scan tax proportional to pending deletes, paid per read, traded
  * against a rewrite proportional to touched file groups, paid once:
  * exactly Delta's DV trade.
  */
object DeleteVectors {

  /** sources.Filter → public-API Column, for the positions computation
    * ([[graft.stages.MergeTable.deleteVectors]] takes a Column) and the
    * eligibility row count. `None` = untranslated → the statement is not
    * DV-eligible and falls down the ladder to the group rewrite.
    */
  def filterToColumn(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v)            => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v)        => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v)           => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case sources.In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a)                => Some(col(a).isNull)
    case sources.IsNotNull(a)             => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case sources.StringContains(a, v)     => Some(col(a).contains(v))
    case sources.And(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
    case sources.Or(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
    case sources.Not(c) => filterToColumn(c).map(!_)
    case _ => None
  }

  /** sources.Filter → ordinal-bound Catalyst expression over the table's
    * data schema, for per-row evaluation inside the pending-DV scan.
    * Bound (not name-resolved) so the expression serializes to executors
    * and evaluates without an analyzer. Must accept exactly what
    * [[filterToColumn]] accepts: DV eligibility is checked against BOTH
    * at delete time, so the scan can never meet a filter it cannot bind.
    */
  def filterToBound(f: sources.Filter, schema: StructType): Option[Expression] = {
    def ref(a: String): Option[BoundReference] = {
      val i = schema.fieldNames.indexOf(a)
      if (i < 0) None
      else Some(BoundReference(i, schema(i).dataType, schema(i).nullable))
    }
    def cmp(a: String, v: Any)(mk: (Expression, Expression) => Expression) =
      ref(a).map(b => mk(b, Literal.create(v, b.dataType)))
    f match {
      case sources.EqualTo(a, v)            => cmp(a, v)(CEqualTo(_, _))
      case sources.EqualNullSafe(a, v)      => cmp(a, v)(CEqualNullSafe(_, _))
      case sources.GreaterThan(a, v)        => cmp(a, v)(CGreaterThan(_, _))
      case sources.GreaterThanOrEqual(a, v) => cmp(a, v)(CGreaterThanOrEqual(_, _))
      case sources.LessThan(a, v)           => cmp(a, v)(CLessThan(_, _))
      case sources.LessThanOrEqual(a, v)    => cmp(a, v)(CLessThanOrEqual(_, _))
      case sources.In(a, vs) =>
        ref(a).map(b => CIn(b, vs.map(Literal.create(_, b.dataType)).toIndexedSeq))
      case sources.IsNull(a)                => ref(a).map(CIsNull(_))
      case sources.IsNotNull(a)             => ref(a).map(CIsNotNull(_))
      case sources.StringStartsWith(a, v) =>
        ref(a).map(b => org.apache.spark.sql.catalyst.expressions.StartsWith(
          b, Literal.create(v, b.dataType)))
      case sources.StringEndsWith(a, v) =>
        ref(a).map(b => org.apache.spark.sql.catalyst.expressions.EndsWith(
          b, Literal.create(v, b.dataType)))
      case sources.StringContains(a, v) =>
        ref(a).map(b => org.apache.spark.sql.catalyst.expressions.Contains(
          b, Literal.create(v, b.dataType)))
      case sources.And(l, r) =>
        for { le <- filterToBound(l, schema); re <- filterToBound(r, schema) }
          yield CAnd(le, re)
      case sources.Or(l, r) =>
        for { le <- filterToBound(l, schema); re <- filterToBound(r, schema) }
          yield COr(le, re)
      case sources.Not(c) => filterToBound(c, schema).map(CNot(_))
      case _ => None
    }
  }

  /** True iff every filter translates on BOTH paths the DV mode needs
    * (Column for positions/count, bound expression for the scan).
    */
  def translatable(filters: Array[sources.Filter], schema: StructType): Boolean =
    filters.nonEmpty && filters.forall(f =>
      filterToColumn(f).isDefined && filterToBound(f, schema).isDefined)

  // ---- predicate sidecar files (beside the positions parquet) --------

  private val PredPrefix = "_pred_"

  /** Persist one DV delete's filter array beside the positions sidecar.
    * sources.Filter case classes are Serializable and version-stable;
    * the artifact is pending-state with sidecar lifetime (reconcile or
    * vacuum sweeps the directory), never a long-lived format.
    */
  def writePredicates(dvDir: Path, filters: Array[sources.Filter]): Unit = {
    val f = dvDir.resolve(s"$PredPrefix${java.util.UUID.randomUUID()}.bin")
    val out = new java.io.ObjectOutputStream(Files.newOutputStream(f))
    try out.writeObject(filters) finally out.close()
  }

  /** All pending DV deletes' filter arrays (one array per DELETE
    * statement; the deleted set is the OR of the ANDed arrays).
    */
  def readPredicates(dvDir: Path): Seq[Array[sources.Filter]] = {
    val entries = Files.list(dvDir)
    try {
      import scala.jdk.CollectionConverters._
      entries.iterator().asScala
        .filter(_.getFileName.toString.startsWith(PredPrefix))
        .toSeq.sortBy(_.getFileName.toString)
        .map { p =>
          val in = new java.io.ObjectInputStream(Files.newInputStream(p))
          try in.readObject().asInstanceOf[Array[sources.Filter]]
          finally in.close()
        }
    } finally entries.close()
  }

  /** The scan-side deleted-row predicate: OR over the pending DELETEs of
    * the AND of each statement's filters. Throws when a filter fails to
    * bind — impossible for sidecars written by the DV ladder (bindability
    * was an eligibility condition), so a throw means the sidecar was
    * written outside the SQL surface; the caller turns that into a
    * "reconcile first" error.
    */
  def deletedExpr(preds: Seq[Array[sources.Filter]], schema: StructType): Expression =
    preds.map { fs =>
      fs.map(f => filterToBound(f, schema).getOrElse(throw new IllegalStateException(
        s"deletion-vector predicate $f does not bind to schema ${schema.simpleString}")))
        .reduceLeft(CAnd(_, _))
    }.reduceLeft(COr(_, _))
}

/** The pending-DV scan: delegates file I/O to the DSv2 parquet scan over
  * the version directory, then drops rows matching the pending delete
  * predicates in a row-level wrapper. COLUMN PRUNING survives the
  * wrapper — the delegated scan reads the query's required columns
  * widened by the predicate columns (needed to evaluate the deletes),
  * and the reader projects the widened rows back to the required schema
  * — so the read tax of the pending window is the row filter plus a few
  * extra columns, not a full-width scan. Query-filter pushdown and
  * columnar reads are still declined for the window's duration; the
  * reconcile clears all of it.
  */
private[lake] final class DvPendingScanBuilder(table: GraftTable, dataPath: String,
                                               preds: Seq[Array[sources.Filter]])
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private var required: StructType = table.schema()

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val dataSchema = table.schema()
    // widen the delegated read by the predicate columns the wrapper needs
    val predCols = preds.flatten.flatMap(_.references).distinct.toSet
    val widened = StructType(required.fields ++
      dataSchema.fields.filter(f =>
        predCols.contains(f.name) && !required.fieldNames.contains(f.name)))
    val innerBuilder = table.parquetTable(Seq(dataPath))
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    innerBuilder match {
      case p: org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns =>
        p.pruneColumns(widened)
      case _ => ()
    }
    val innerScan = innerBuilder.build()
    // bind against what the delegated scan actually emits
    val emitted = innerScan.readSchema()
    val deleted = DeleteVectors.deletedExpr(preds, emitted)
    val keepOrdinals = required.fields.map(f => emitted.fieldIndex(f.name))
    val req = required

    new Scan {
      override def readSchema(): StructType = req

      override def toBatch: Batch = new Batch {
        private val ib = innerScan.toBatch
        override def planInputPartitions(): Array[InputPartition] = ib.planInputPartitions()
        override def createReaderFactory(): PartitionReaderFactory =
          new DvReaderFactory(ib.createReaderFactory(), deleted,
            keepOrdinals, emitted)
      }

      override def description(): String =
        s"GraftDvPendingScan(${table.name()}, read=${req.fieldNames.mkString(",")}, " +
          s"deleted=${deleted.sql})"
    }
  }
}

/** Row-filtering + re-projecting reader wrapper. Serializable: ships the
  * bound Catalyst expression and the keep ordinals; compiles the
  * predicate and projection lazily per reader on the executor. Columnar
  * reads are declined so every row passes the predicate.
  */
private[lake] final class DvReaderFactory(inner: PartitionReaderFactory,
                                          deleted: Expression,
                                          keepOrdinals: Array[Int],
                                          emitted: StructType)
  extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = inner.createReader(partition)
    new PartitionReader[InternalRow] {
      private val drop = { val p = Predicate.create(deleted); p.initialize(0); p }
      private val project = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(keepOrdinals.toIndexedSeq.map(i =>
          BoundReference(i, emitted(i).dataType, emitted(i).nullable): Expression))
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (r.next()) {
          val row = r.get()
          if (!drop.eval(row)) { cur = project(row); return true }
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = r.close()
    }
  }
}
