package graft.sources

import java.util
import scala.io.Source
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
    util.EnumSet.of(TableCapability.BATCH_READ)
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
