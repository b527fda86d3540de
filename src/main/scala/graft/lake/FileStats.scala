package graft.lake

import java.nio.file.Path

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.sources._

/** Per-file column statistics read from parquet FOOTERS, plus a
  * conservative evaluator deciding whether a file MIGHT contain a row
  * matching a pushed filter — the pruning primitive behind per-file
  * group replacement in [[GraftRowLevelOperation]].
  *
  * Footers are read ONCE per data file — at commit time, when
  * [[graft.stages.MergeTable]] persists these stats into the version's
  * `_STATS` manifest ([[StatsManifest]], the same shape Iceberg manifests
  * / Delta log stats persist); statement planning reads the manifest and
  * only falls back to a live footer read for files a manifest does not
  * cover. Either way the pruning contract is identical: every answer errs
  * on "might match", never on "cannot match", so pruning is a pure
  * optimization — any unreadable footer, exotic type, or untranslatable
  * predicate simply keeps the file.
  *
  * Comparisons normalize both the filter literal and the footer min/max
  * into a small comparable domain (Long, Double, String by code point,
  * BigDecimal). Strings compare by CODE POINT, matching parquet's
  * unsigned-byte UTF-8 statistics order — `String.compareTo`'s UTF-16
  * code-unit order would disagree on supplementary characters and could
  * prune a file that actually matches.
  */
object FileStats {

  /** One column's footer summary. `loBound`/`hiBound` are normalized
    * comparable values covering every non-null value in the file; `None`
    * when the footer carries no usable statistics for the column (then
    * only null-ness questions can be answered). `mayHaveNulls` /
    * `mayHaveNonNull` are conservative (true unless the footer proves
    * otherwise).
    */
  final case class ColStats(loBound: Option[Any], hiBound: Option[Any],
                            mayHaveNulls: Boolean, mayHaveNonNull: Boolean)

  /** All-null semantics for a column the file predates (additive schema
    * evolution backfills NULL at read time).
    */
  private val AbsentCol = ColStats(None, None, mayHaveNulls = true, mayHaveNonNull = false)

  /** Unknown semantics: present but nothing provable. */
  private val UnknownCol = ColStats(None, None, mayHaveNulls = true, mayHaveNonNull = true)

  /** Footer summary of one data file. `present` holds the lower-cased
    * top-level column names physically in the file — a declared column
    * NOT in it reads as NULL everywhere (schema evolution), which is
    * itself prunable knowledge. `unreadable` marks a footer that could
    * not be parsed: every column then answers "unknown" and nothing
    * prunes.
    */
  final case class FileStat(fileName: String, rowCount: Long,
                            present: Set[String], cols: Map[String, ColStats],
                            unreadable: Boolean = false) {
    def colStats(attribute: String): ColStats = {
      val a = attribute.toLowerCase(java.util.Locale.ROOT)
      if (unreadable || a.contains('.')) UnknownCol // nested fields: not evaluated
      else if (!present.contains(a)) AbsentCol
      else cols.getOrElse(a, UnknownCol)
    }
  }

  /** Read one file's footer; any failure degrades to a prune-nothing
    * stat (pruning must never turn an I/O hiccup into a wrong answer).
    */
  def read(file: Path, conf: Configuration): FileStat =
    try readFooter(file, conf)
    catch { case NonFatal(_) =>
      FileStat(file.getFileName.toString, -1L, Set.empty, Map.empty, unreadable = true) }

  private def readFooter(file: Path, conf: Configuration): FileStat = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf))
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      val present = schema.getFields.asScala.map(
        _.getName.toLowerCase(java.util.Locale.ROOT)).toSet
      var rows = 0L
      // accumulate across row groups; a column is only evaluable if every
      // chunk carrying values yields usable, convertible min/max
      final case class Acc(var lo: Any, var hi: Any, var ok: Boolean,
                           var nulls: Boolean, var nonNull: Boolean)
      val accs = scala.collection.mutable.LinkedHashMap.empty[String, Acc]
      footer.getBlocks.asScala.foreach { block =>
        rows += block.getRowCount
        block.getColumns.asScala.foreach { cc =>
          val parts = cc.getPath.toArray
          if (parts.length == 1) {
            val name = parts(0).toLowerCase(java.util.Locale.ROOT)
            val acc = accs.getOrElseUpdate(name, Acc(null, null, ok = true,
              nulls = false, nonNull = false))
            val stats = cc.getStatistics
            if (stats == null || stats.isEmpty) {
              // no stats written: values unknown, null-ness unknown
              acc.ok = false; acc.nulls = true; acc.nonNull = true
            } else {
              val numNulls = stats.getNumNulls // -1 = unknown
              if (numNulls != 0L) acc.nulls = true
              val chunkAllNull = numNulls >= 0 && numNulls == cc.getValueCount
              if (!chunkAllNull) acc.nonNull = true
              if (!chunkAllNull && acc.ok) {
                if (!stats.hasNonNullValue) acc.ok = false
                else convertBounds(cc.getPrimitiveType, stats) match {
                  case Some((lo, hi)) =>
                    if (acc.lo == null || compare(lo, acc.lo).exists(_ < 0)) acc.lo = lo
                    else if (acc.lo != null && compare(lo, acc.lo).isEmpty) acc.ok = false
                    if (acc.ok && (acc.hi == null || compare(hi, acc.hi).exists(_ > 0))) acc.hi = hi
                  case None => acc.ok = false
                }
              }
            }
          }
        }
      }
      val cols = accs.iterator.map { case (name, a) =>
        name -> ColStats(
          loBound = if (a.ok && a.lo != null) Some(a.lo) else None,
          hiBound = if (a.ok && a.hi != null) Some(a.hi) else None,
          mayHaveNulls = a.nulls, mayHaveNonNull = a.nonNull)
      }.toMap
      FileStat(file.getFileName.toString, rows, present, cols)
    } finally reader.close()
  }

  /** Footer min/max → normalized comparable bounds, or None when the
    * physical/logical type is outside the evaluated set.
    */
  private def convertBounds(tpe: org.apache.parquet.schema.PrimitiveType,
                            stats: org.apache.parquet.column.statistics.Statistics[_])
      : Option[(Any, Any)] = {
    val logical = tpe.getLogicalTypeAnnotation
    def decimalScale: Option[Int] = logical match {
      case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => Some(d.getScale)
      case _ => None
    }
    (tpe.getPrimitiveTypeName, stats) match {
      case (PrimitiveTypeName.INT32, s: org.apache.parquet.column.statistics.IntStatistics) =>
        decimalScale match {
          case Some(sc) => Some((BigDecimal(BigInt(s.getMin), sc), BigDecimal(BigInt(s.getMax), sc)))
          case None => Some((s.getMin.toLong, s.getMax.toLong)) // ints and DATE days share the Long domain
        }
      case (PrimitiveTypeName.INT64, s: org.apache.parquet.column.statistics.LongStatistics) =>
        logical match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => t.getUnit match {
            case TimeUnit.MICROS => Some((s.getMin, s.getMax))
            case TimeUnit.MILLIS => Some((s.getMin * 1000L, s.getMax * 1000L))
            case TimeUnit.NANOS  => Some((Math.floorDiv(s.getMin, 1000L),
                                          Math.floorDiv(s.getMax + 999L, 1000L)))
            case _ => None
          }
          case _ => decimalScale match {
            case Some(sc) => Some((BigDecimal(BigInt(s.getMin), sc), BigDecimal(BigInt(s.getMax), sc)))
            case None => Some((s.getMin, s.getMax))
          }
        }
      case (PrimitiveTypeName.FLOAT, s: org.apache.parquet.column.statistics.FloatStatistics) =>
        if (s.getMin.isNaN || s.getMax.isNaN) None else Some((s.getMin.toDouble, s.getMax.toDouble))
      case (PrimitiveTypeName.DOUBLE, s: org.apache.parquet.column.statistics.DoubleStatistics) =>
        if (s.getMin.isNaN || s.getMax.isNaN) None else Some((s.getMin, s.getMax))
      case (PrimitiveTypeName.BOOLEAN, s: org.apache.parquet.column.statistics.BooleanStatistics) =>
        Some(((if (s.getMin) 1L else 0L), (if (s.getMax) 1L else 0L)))
      case (PrimitiveTypeName.BINARY, s: org.apache.parquet.column.statistics.BinaryStatistics) =>
        logical match {
          case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
            Some((s.genericGetMin.toStringUsingUTF8, s.genericGetMax.toStringUsingUTF8))
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            Some((BigDecimal(BigInt(s.genericGetMin.getBytes), d.getScale),
                  BigDecimal(BigInt(s.genericGetMax.getBytes), d.getScale)))
          case _ => None
        }
      case (PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY, s: org.apache.parquet.column.statistics.BinaryStatistics) =>
        decimalScale.map(sc => (BigDecimal(BigInt(s.genericGetMin.getBytes), sc),
                                BigDecimal(BigInt(s.genericGetMax.getBytes), sc)))
      case _ => None
    }
  }

  /** Filter literal → the same comparable domain as footer bounds. */
  private def toComparable(v: Any): Option[Any] = v match {
    case null => None
    case b: Boolean => Some(if (b) 1L else 0L)
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case f: Float => if (f.isNaN) None else Some(f.toDouble)
    case d: Double => if (d.isNaN) None else Some(d)
    case s: String => Some(s)
    case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case t: java.sql.Timestamp =>
      // getTime's millis component duplicates nanos/1e6 — remove it, then
      // add back the full microsecond part
      Some(t.getTime * 1000L - (t.getNanos / 1000000L) * 1000L + t.getNanos / 1000L)
    case i: java.time.Instant =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
    case d: java.math.BigDecimal => Some(BigDecimal(d))
    case d: BigDecimal => Some(d)
    case _ => None
  }

  /** Tri-state-ish compare in the normalized domain: None = not
    * comparable (different domains) → caller must stay conservative.
    */
  private def compare(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: Long, y: Double) => Some(java.lang.Double.compare(x.toDouble, y))
    case (x: Double, y: Long) => Some(java.lang.Double.compare(x, y.toDouble))
    case (x: String, y: String) => Some(compareCodePoints(x, y))
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case (x: BigDecimal, y: Long) => Some(x.compare(BigDecimal(y)))
    case (x: Long, y: BigDecimal) => Some(BigDecimal(x).compare(y))
    case (x: BigDecimal, y: Double) => Some(x.compare(BigDecimal(y)))
    case (x: Double, y: BigDecimal) => Some(BigDecimal(x).compare(y))
    case _ => None
  }

  /** Code-point order == UTF-8 unsigned-byte order (what parquet binary
    * statistics are min/max under).
    */
  private def compareCodePoints(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Could the file contain a row satisfying ALL `filters`? Conjunction
    * of per-filter answers; each answer is conservative.
    */
  def mightMatch(stat: FileStat, filters: Seq[Filter]): Boolean =
    filters.forall(f => mightMatchOne(stat, f))

  private def mightMatchOne(stat: FileStat, filter: Filter): Boolean = filter match {
    case EqualTo(a, v) => rangeMayContain(stat.colStats(a), v)
    case EqualNullSafe(a, null) => stat.colStats(a).mayHaveNulls
    case EqualNullSafe(a, v) => rangeMayContain(stat.colStats(a), v)
    case In(a, vs) =>
      val cs = stat.colStats(a)
      vs.exists(v => rangeMayContain(cs, v))
    case GreaterThan(a, v) => boundCheck(stat.colStats(a), v)(_.hiBound, _ > 0)
    case GreaterThanOrEqual(a, v) => boundCheck(stat.colStats(a), v)(_.hiBound, _ >= 0)
    case LessThan(a, v) => boundCheck(stat.colStats(a), v)(_.loBound, _ < 0)
    case LessThanOrEqual(a, v) => boundCheck(stat.colStats(a), v)(_.loBound, _ <= 0)
    case IsNull(a) => stat.colStats(a).mayHaveNulls
    case IsNotNull(a) => stat.colStats(a).mayHaveNonNull
    case And(l, r) => mightMatchOne(stat, l) && mightMatchOne(stat, r)
    case Or(l, r) => mightMatchOne(stat, l) || mightMatchOne(stat, r)
    case Not(EqualTo(a, v)) =>
      // false only when provably every row equals v (no nulls, min=max=v)
      val cs = stat.colStats(a)
      val allEqualV = (cs.loBound, cs.hiBound, toComparable(v)) match {
        case (Some(lo), Some(hi), Some(w)) =>
          !cs.mayHaveNulls && compare(lo, w).contains(0) && compare(hi, w).contains(0)
        case _ => false
      }
      !allEqualV
    case StringStartsWith(a, prefix) =>
      val cs = stat.colStats(a)
      (cs.loBound, cs.hiBound) match {
        case (Some(lo: String), Some(hi: String)) =>
          cs.mayHaveNonNull &&
            compareCodePoints(hi, prefix) >= 0 &&
            compareCodePoints(lo.substring(0, math.min(lo.length, prefix.length)), prefix) <= 0
        case _ => cs.mayHaveNonNull
      }
    case AlwaysFalse() => false
    case AlwaysTrue() => true
    case _ => true // unevaluated filter shapes never prune
  }

  /** Does EVERY row of the file satisfy ALL `filters`? The dual of
    * [[mightMatch]], powering metadata-only DELETE: a file may be dropped
    * wholesale only when the footer PROVES each row matches. Conservative
    * direction is therefore FALSE — any unknown (missing bounds, possible
    * nulls, unevaluated shape) answers "not provable" and the statement
    * falls back to the rewrite path.
    */
  def mustMatchAll(stat: FileStat, filters: Seq[Filter]): Boolean =
    !stat.unreadable && filters.forall(f => mustMatchAllOne(stat, f))

  private def mustMatchAllOne(stat: FileStat, filter: Filter): Boolean = filter match {
    case EqualTo(a, v) =>
      val cs = stat.colStats(a)
      !cs.mayHaveNulls && ((cs.loBound, cs.hiBound, toComparable(v)) match {
        case (Some(lo), Some(hi), Some(w)) =>
          compare(lo, w).contains(0) && compare(hi, w).contains(0)
        case _ => false
      })
    case GreaterThan(a, v) => allBeyond(stat.colStats(a), v)(_.loBound, _ > 0)
    case GreaterThanOrEqual(a, v) => allBeyond(stat.colStats(a), v)(_.loBound, _ >= 0)
    case LessThan(a, v) => allBeyond(stat.colStats(a), v)(_.hiBound, _ < 0)
    case LessThanOrEqual(a, v) => allBeyond(stat.colStats(a), v)(_.hiBound, _ <= 0)
    case In(a, vs) =>
      // provable only in the degenerate single-value file
      val cs = stat.colStats(a)
      vs.exists(v => mustMatchAllOne(stat, EqualTo(a, v))) && !cs.mayHaveNulls
    case IsNull(a) => !stat.colStats(a).mayHaveNonNull
    case IsNotNull(a) => !stat.colStats(a).mayHaveNulls
    case And(l, r) => mustMatchAllOne(stat, l) && mustMatchAllOne(stat, r)
    case Or(l, r) => mustMatchAllOne(stat, l) || mustMatchAllOne(stat, r)
    case StringStartsWith(a, prefix) =>
      // both bounds sharing the prefix pins every value in between to it
      val cs = stat.colStats(a)
      !cs.mayHaveNulls && ((cs.loBound, cs.hiBound) match {
        case (Some(lo: String), Some(hi: String)) =>
          lo.startsWith(prefix) && hi.startsWith(prefix)
        case _ => false
      })
    case AlwaysTrue() => true
    case _ => false // unevaluated shapes are never provably-all
  }

  /** Every row strictly beyond `v` on the proving bound (lo for >, hi
    * for <): nulls disprove (NULL never satisfies a comparison).
    */
  private def allBeyond(cs: ColStats, v: Any)(bound: ColStats => Option[Any],
                                              ok: Int => Boolean): Boolean =
    !cs.mayHaveNulls && ((bound(cs), toComparable(v)) match {
      case (Some(b), Some(w)) => compare(b, w).exists(ok)
      case _ => false
    })

  /** v within [lo, hi]? Conservative on any unknown. Null literal in an
    * equality never matches (SQL three-valued logic).
    */
  private def rangeMayContain(cs: ColStats, v: Any): Boolean = {
    if (v == null) return false
    if (!cs.mayHaveNonNull) return false
    (cs.loBound, cs.hiBound, toComparable(v)) match {
      case (Some(lo), Some(hi), Some(w)) =>
        compare(lo, w).forall(_ <= 0) && compare(hi, w).forall(_ >= 0)
      case _ => true
    }
  }

  /** Could SOME row satisfy a one-sided comparison? The proving bound is
    * hi for `>`-family filters and lo for `<`-family (the most permissive
    * row the file can hold); unknowns answer "might".
    */
  private def boundCheck(cs: ColStats, v: Any)(bound: ColStats => Option[Any],
                                               ok: Int => Boolean): Boolean =
    cs.mayHaveNonNull && ((bound(cs), toComparable(v)) match {
      case (Some(b), Some(w)) => compare(b, w).forall(ok)
      case _ => true
    })
}
