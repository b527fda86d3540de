package graft.sources

import java.util
import scala.io.Source
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => StreamOffset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector with the reference extractor's pagination
  * semantics (`modules/load_couriers.py:8-37`, `load_deliveries.py:8-53`):
  * offset/limit pages of raw JSON records, a hard page cap, and an optional
  * `[from, to)` time window on `delivery_ts` — but Spark-native: every page
  * is an `InputPartition`, so the "API" is scanned by executors in parallel
  * instead of the reference's single-threaded 5-s-per-page loop.
  *
  * The backing store is a JSON-lines file standing in for the REST endpoint
  * (one line = one API record). Reader output is the STG landing shape
  * `(json_response string, delivery_ts string)` — schema-on-read extraction
  * stays in [[graft.stages.StgToDds.parseDeliveries]], exactly like the
  * reference's STG→DDS boundary.
  *
  * Options: `path` (jsonl file), `pageSize` (default 50), `maxPages`
  * (default 200 — the reference's defensive cap), `from`/`to`
  * ('yyyy-MM-dd HH:mm:ss', applied to the record's delivery_ts string —
  * the reference pushes the same window to the API as query params).
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedJsonTable(new CaseInsensitiveStringMap(properties))
}

object PagedJsonSource {
  val schema: StructType = StructType(Seq(
    StructField("json_response", StringType, nullable = false),
    StructField("delivery_ts", StringType, nullable = true)))

  /** Lenient field grab from a one-line JSON record (API contract keeps
    * delivery_ts as "yyyy-MM-dd HH:mm:ss"); no full parse needed here.
    */
  def extractTs(line: String): String = {
    val key = "\"delivery_ts\":"
    val i = line.indexOf(key)
    if (i < 0) null
    else {
      val rest = line.substring(i + key.length).dropWhile(c => c == ' ' || c == '"')
      rest.takeWhile(_ != '"')
    }
  }
}

final class PagedJsonTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"paged_json(${options.get("path")})"
  override def schema(): StructType = PagedJsonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // getTable receives the merged properties; prefer those over the
    // scan-time map so .option(...) values always arrive
    val merged = new util.HashMap[String, String]()
    merged.putAll(options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new PagedJsonScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

final class PagedJsonScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsReportStatistics {
  private val path = options.get("path")
  private val pageSize = options.getInt("pageSize", 50)
  private val maxPages = options.getInt("maxPages", 200)
  private var from = Option(options.get("from"))
  private var to = Option(options.get("to"))
  private var pushed: Array[sources.Filter] = Array.empty
  private var required: StructType = PagedJsonSource.schema

  /** Column pruning: a projection that only needs `delivery_ts` never
    * materializes the (much wider) `json_response` payload per row.
    */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Catalyst predicate pushdown → the API's time window: a
    * `delivery_ts >= f` filter tightens `from` and `delivery_ts < t`
    * tightens `to` — exactly what the reference does by forwarding the
    * window as REST query params (`load_deliveries.py:19-24`). The
    * timestamp strings ('yyyy-MM-dd HH:mm:ss') order lexicographically,
    * so string max/min compose windows exactly; fully-absorbed filters
    * are NOT re-evaluated after the scan. Anything else stays a residual
    * Spark filter.
    */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val residual = filters.filter {
      case sources.GreaterThanOrEqual("delivery_ts", v: String) =>
        from = Some(from.fold(v)(f => if (v > f) v else f)); false
      case sources.LessThan("delivery_ts", v: String) =>
        to = Some(to.fold(v)(t => if (v < t) v else t)); false
      case _ => true
    }
    pushed = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PagedJsonMicroBatchStream(path, pageSize, maxPages, from, to,
      required.map(_.name))
  override def description(): String =
    s"PagedJsonScan path=$path pageSize=$pageSize " +
      s"window=[${from.getOrElse("-inf")}, ${to.getOrElse("+inf")}) " +
      s"PushedFilters: [${pushed.mkString(", ")}] " +
      s"ReadSchema: ${required.map(_.name).mkString("[", ",", "]")}"

  /** One driver pass counts records (the "API"'s total) AND records the
    * byte offset where each page begins, so every reader seeks straight to
    * its page — total read cost is O(file + pages×pageSize), not the
    * O(pages×file) a re-scan-from-line-0 reader would pay. Offsets are
    * exact because they are taken at '\n' bytes (UTF-8 multi-byte
    * sequences never contain 0x0A). Lazy + cached: both statistics
    * estimation and partition planning read it, one pass serves both.
    */
  private lazy val pageIndex: (Array[Long], Long) = {
    val in = new java.io.FileInputStream(path)
    val pageStarts = scala.collection.mutable.ArrayBuffer[Long](0L)
    var lines = 0L
    var pos = 0L
    var lastLineOpen = false
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) {
          pos += 1
          if (buf(i) == '\n') {
            lines += 1
            if (lines % pageSize == 0) pageStarts += pos
            lastLineOpen = false
          } else lastLineOpen = true
          i += 1
        }
        n = in.read(buf)
      }
    } finally in.close()
    if (lastLineOpen) lines += 1 // final line without a trailing newline
    (pageStarts.toArray, lines)
  }

  private def plannedPages: Int = {
    val (_, lines) = pageIndex
    math.min((lines + pageSize - 1) / pageSize, maxPages.toLong).toInt
  }

  /** Real statistics from the plan-time index: without them a DSv2 source
    * reports the defaultSizeInBytes sentinel (Long.MaxValue), which (a)
    * blinds join planning and (b) forces rules like
    * [[graft.plans.DehintOversizedBroadcasts]] into their stats-unknown
    * path. sizeInBytes = the bytes the planned pages actually cover
    * (pre-filter upper bound), numRows = line count capped by the page cap.
    */
  override def estimateStatistics(): Statistics = {
    val (starts, lines) = pageIndex
    val pages = plannedPages
    val endByte =
      if (pages < starts.length) starts(pages) else new java.io.File(path).length()
    val rows = math.min(lines, maxPages.toLong * pageSize)
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(endByte)
      override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
    }
  }

  /** One InputPartition per page. */
  override def planInputPartitions(): Array[InputPartition] = {
    val (pageStarts, _) = pageIndex
    val cols = required.map(_.name)
    (0 until plannedPages).map(p =>
      PagedJsonPartition(path, pageStarts(p), pageSize, from, to, cols): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PagedJsonReader(partition.asInstanceOf[PagedJsonPartition])
    }
}

final case class PagedJsonPartition(path: String, startByte: Long, limit: Int,
                                    from: Option[String], to: Option[String],
                                    columns: Seq[String] = Seq("json_response", "delivery_ts"))
    extends InputPartition

/** Reads exactly one page (seek to `startByte`, then `limit` lines) of the
  * record stream, applying the `[from, to)` window like the API would
  * server-side. delivery_ts strings in 'yyyy-MM-dd HH:mm:ss' compare
  * correctly as strings.
  */
final class PagedJsonReader(p: PagedJsonPartition)
    extends PartitionReader[InternalRow] {
  private val fin = new java.io.FileInputStream(p.path)
  fin.getChannel.position(p.startByte)
  private val src = Source.fromInputStream(fin)
  private val it = src.getLines().take(p.limit)
    .filter { line =>
      val ts = PagedJsonSource.extractTs(line)
      (p.from, p.to) match {
        case (Some(f), Some(t)) => ts != null && ts >= f && ts < t
        case (Some(f), None)    => ts != null && ts >= f
        case (None, Some(t))    => ts != null && ts < t
        case _                  => true
      }
    }
  private var current: String = _

  override def next(): Boolean = {
    if (it.hasNext) { current = it.next(); true } else false
  }
  override def get(): InternalRow = {
    val values = p.columns.map {
      case "json_response" => UTF8String.fromString(current)
      case "delivery_ts" =>
        val ts = PagedJsonSource.extractTs(current)
        if (ts == null) null else UTF8String.fromString(ts)
    }
    InternalRow(values: _*)
  }
  override def close(): Unit = src.close()
}

/** Stream position in the record stream: records ingested so far and the
  * byte where the next one starts — the byte lets every incremental probe
  * tail-scan only the NEW bytes instead of re-reading the file from zero.
  */
final case class PagedJsonOffset(line: Long, byte: Long) extends StreamOffset {
  override def json(): String = s"""{"line":$line,"byte":$byte}"""
}

object PagedJsonOffset {
  private val Pat = """\{"line":(\d+),"byte":(\d+)\}""".r
  def fromJson(s: String): PagedJsonOffset = s match {
    case Pat(l, b) => PagedJsonOffset(l.toLong, b.toLong)
    case _ => throw new IllegalArgumentException(s"bad PagedJsonOffset: $s")
  }
}

/** The STREAMING form of the paginated extractor — the reference's repeated
  * DAG runs (`load_deliveries.py`: each run pages from its watermark
  * forward, capped at `maxPages`) as one continuous Structured Streaming
  * source. The JSONL file stands in for the API's append-only record
  * stream; each micro-batch ingests the lines appended since the last
  * committed offset, split into `pageSize`-line InputPartitions (the same
  * page = partition shape as the batch scan), and the defensive page cap
  * becomes ADMISSION CONTROL: at most `maxPages × pageSize` records per
  * trigger, so a large backlog drains as several paged micro-batches —
  * exactly the multi-run catch-up the reference performs, with the engine's
  * checkpointed exactly-once replacing the hand-rolled watermark table.
  *
  * Contract: appends are line-atomic (a record is visible once its bytes
  * are in the file — the JSONL analogue of the API's commit point). The
  * `[from,to)` window options filter server-side in the readers, like the
  * reference forwarding the window as query params. Offsets carry the byte
  * position, so every latest-offset probe scans ONLY the new bytes
  * (O(delta), never O(file)); partition planning re-scans just the batch's
  * byte range to place page starts.
  */
final class PagedJsonMicroBatchStream(path: String, pageSize: Int, maxPages: Int,
    from: Option[String], to: Option[String], columns: Seq[String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow contract: pin the stream's end goal ONCE at query
  // start; subsequent capped batches advance toward it and the query
  // self-terminates there — without this the engine would fall back to one
  // uncapped Trigger.Once batch (ignoring the page-cap admission control).
  @volatile private var availableNowTarget: Option[PagedJsonOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(tailScan(0L, 0L, Long.MaxValue))

  /** Count newline-terminated records in [fromByte, EOF) plus a final
    * unterminated record if the file ends mid-line-without-newline,
    * stopping after `maxLines`. Returns (lines, endByte) where endByte is
    * the position after the last counted record.
    */
  private def tailScan(fromByte: Long, fromLine: Long, maxLines: Long): PagedJsonOffset = {
    val f = new java.io.File(path)
    if (!f.exists() || f.length() <= fromByte || maxLines <= 0)
      return PagedJsonOffset(fromLine, fromByte)
    val in = new java.io.FileInputStream(path)
    try {
      in.getChannel.position(fromByte)
      val buf = new Array[Byte](1 << 16)
      var lines = 0L
      var pos = fromByte
      var lastEnd = fromByte
      var lastOpen = false
      var n = in.read(buf)
      while (n > 0 && lines < maxLines) {
        var i = 0
        while (i < n && lines < maxLines) {
          pos += 1
          if (buf(i) == '\n') { lines += 1; lastEnd = pos; lastOpen = false }
          else lastOpen = true
          i += 1
        }
        n = if (lines < maxLines) in.read(buf) else -1
      }
      // an unterminated final record counts once the writer is done with
      // the file tail — mirrors the batch reader's final-line handling
      if (lastOpen && pos >= f.length() && lines < maxLines) {
        lines += 1; lastEnd = pos
      }
      PagedJsonOffset(fromLine + lines, lastEnd)
    } finally in.close()
  }

  /** Page-start bytes inside [startByte, endByte) every `pageSize` lines. */
  private def pageStarts(startByte: Long, endByte: Long): Array[Long] = {
    val starts = scala.collection.mutable.ArrayBuffer[Long](startByte)
    val in = new java.io.FileInputStream(path)
    try {
      in.getChannel.position(startByte)
      val buf = new Array[Byte](1 << 16)
      var lines = 0L
      var pos = startByte
      var n = in.read(buf)
      while (n > 0 && pos < endByte) {
        var i = 0
        while (i < n && pos < endByte) {
          pos += 1
          if (buf(i) == '\n') {
            lines += 1
            if (lines % pageSize == 0 && pos < endByte) starts += pos
          }
          i += 1
        }
        n = if (pos < endByte) in.read(buf) else -1
      }
    } finally in.close()
    starts.toArray
  }

  override def initialOffset(): StreamOffset = PagedJsonOffset(0L, 0L)

  override def deserializeOffset(json: String): StreamOffset =
    PagedJsonOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(maxPages.toLong * pageSize)

  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val s = start.asInstanceOf[PagedJsonOffset]
    val budget = limit match {
      case r: ReadMaxRows => math.min(r.maxRows(), maxPages.toLong * pageSize)
      case _              => maxPages.toLong * pageSize
    }
    // under AvailableNow, never advance past the pinned target (records
    // appended after query start belong to the next run)
    val capped = availableNowTarget match {
      case Some(t) => math.min(budget, math.max(t.line - s.line, 0L))
      case None    => budget
    }
    tailScan(s.byte, s.line, capped)
  }

  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def reportLatestOffset(): StreamOffset =
    tailScan(0L, 0L, Long.MaxValue)

  override def planInputPartitions(start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[PagedJsonOffset]
    val e = end.asInstanceOf[PagedJsonOffset]
    val totalLines = e.line - s.line
    if (totalLines <= 0) return Array.empty
    val starts = pageStarts(s.byte, e.byte)
    starts.zipWithIndex.map { case (b, p) =>
      val limit = math.min(pageSize.toLong, totalLines - p.toLong * pageSize).toInt
      PagedJsonPartition(path, b, limit, from, to, columns): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PagedJsonReader(partition.asInstanceOf[PagedJsonPartition])
    }

  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()
}
