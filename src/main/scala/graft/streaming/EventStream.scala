package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive reader for the events table's streaming (and probe)
  * consumers — the streaming twin of the normalization `graft.Tables.load`
  * performs for batch scans.
  *
  * The corpus has delivered the `ts` column under three physical encodings
  * across driver regenerations (INT64 TIMESTAMP(NANOS), naive
  * `timestamp[us]`, tz-adjusted µs — see `graft.Tables`). A streaming file
  * source needs a DECLARED schema, so this object probes the live file's
  * footer once per read and declares the matching physical type:
  *   - INT64 nanos → declare `ts: LONG` (requires the `nanosAsLong` shim,
  *     which the entry points' `StateDefaults.withNanosRead` wrappers keep
  *     set for the drain) and rebuild µs via `timestamp_micros(ts div 1000)`;
  *   - naive or tz µs → declare `ts: TIMESTAMP`; the parquet reader loads
  *     the raw µs verbatim (sessions pin UTC), no conversion, no cast node.
  * Every consumer downstream of [[readStream]]/[[readBatch]] sees ONE
  * canonical shape: `ts` as session-TZ TimestampType at µs precision.
  */
object EventStream {

  /** Logical field layout of the events table, parametrized by the
    * physical `ts` encoding the live corpus uses.
    */
  def schemaFor(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The canonical post-normalization schema (ts = TimestampType µs). */
  val normalizedSchema: StructType = schemaFor(TimestampType)

  // A drain probes the same (dir, glob) several times (stream read,
  // max-ts batch probe, both join sides) and each probe is a driver-side
  // footer read; the encoding of a given corpus file set never changes
  // within a JVM (a regeneration lands between rounds — CorpusContractSpec
  // trips the next session), so successful probes are memoized. The
  // empty-dir fallback is NOT cached: a scratch dir probed before its
  // files land must re-probe once they exist.
  private val encodingCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataType]()

  /** Probe the physical ts encoding of the files `glob` matches under
    * `dir` — a footer-only read, one driver round trip per (dir, glob) per
    * JVM. LongType means the legacy nanos corpus; anything timestamp-shaped
    * reads as TimestampType.
    */
  def tsEncoding(spark: SparkSession, dir: String, glob: String = "events.parquet"): DataType = {
    val key = (dir, glob)
    val cached = encodingCache.get(key)
    if (cached != null) cached
    else StateDefaults.withNanosRead(spark) {
      try {
        val enc = spark.read.option("pathGlobFilter", glob)
            .parquet(dir).schema("ts").dataType match {
          case LongType => LongType
          case _        => TimestampType
        }
        encodingCache.put(key, enc)
        enc
      } catch {
        // no matching files → nothing to probe; any declared encoding
        // yields the same (empty) stream, so use the canonical one
        case _: org.apache.spark.sql.AnalysisException => TimestampType
      }
    }
  }

  private def normalize(df: DataFrame, enc: DataType): DataFrame = enc match {
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case _        => df
  }

  /** Streaming read of the events file(s), normalized. Callers that drain
    * a legacy-nanos corpus must hold `StateDefaults.withNanosRead` open
    * around the drain (all entry points do).
    */
  def readStream(spark: SparkSession, dir: String,
                 glob: String = "events.parquet",
                 options: Map[String, String] = Map.empty): DataFrame = {
    val enc = tsEncoding(spark, dir, glob)
    // a legacy-nanos PLAN executes at drain time: leave the read shim set
    // for the caller's drain (their withNanosRead wrapper restores it).
    // A call site OUTSIDE a wrapper would leak legacy read semantics into
    // every later batch parquet read of the session — keep working (the
    // plan itself is fine) but surface the leak loudly.
    if (enc == LongType) {
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "EventStream.readStream on a legacy-nanos corpus called outside " +
            "StateDefaults.withNanosRead: nanosAsLong will persist on the " +
            "session after the drain — wrap the drain to restore it")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    normalize(
      spark.readStream.schema(schemaFor(enc))
        .option("pathGlobFilter", glob).options(options).parquet(dir),
      enc)
  }

  /** Batch read of the same files, normalized — for drain-side probes
    * (max-ts for sentinel placement) and spec fixtures.
    */
  def readBatch(spark: SparkSession, dir: String,
                glob: String = "events.parquet"): DataFrame = {
    val enc = tsEncoding(spark, dir, glob)
    StateDefaults.withNanosRead(spark) {
      normalize(
        spark.read.schema(schemaFor(enc))
          .option("pathGlobFilter", glob).parquet(dir),
        enc)
    }
  }

  /** Max event time in exact integer microseconds, or None for an empty
    * corpus — the drain-side probe that places sentinel flush rows.
    */
  def maxTsMicros(spark: SparkSession, dir: String,
                  glob: String = "events.parquet"): Option[Long] = {
    val row = readBatch(spark, dir, glob)
      .agg(max(unix_micros(col("ts")))).collect().head
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  /** Write sentinel events in the NORMALIZED schema (ts given in µs) —
    * sentinels union with normalized real streams, so they never need to
    * imitate the corpus's physical encoding.
    */
  def writeSentinel(spark: SparkSession, dir: String,
                    rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(dir)
  }

  /** Streaming read of a [[writeSentinel]] directory. */
  def sentinelStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(normalizedSchema).parquet(dir)
}
