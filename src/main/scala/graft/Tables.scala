package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated testdata corpus (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All reads go through here so
  * scan-level conventions (column pruning happens via Catalyst; nothing to
  * hand-tune) stay in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Event-time ingestion contract: the corpus has shipped these columns
    * under THREE physical encodings across driver regenerations — parquet
    * INT64 TIMESTAMP(NANOS) (read as long via `nanosAsLong`, Spark 4
    * refuses nanos outright), naive `timestamp[us]` (isAdjustedToUTC=false,
    * which Spark 4 would infer as TIMESTAMP_NTZ), and tz-adjusted µs. The
    * reference itself documents TZ-naive timestamp tolerance
    * (`DWH Design (ENG).md:157`), so the engine normalizes ALL of them to
    * session-TZ `TimestampType` (µs, sessions pin UTC) HERE, at the scan:
    *   - naive µs: request TimestampType in the read schema instead of the
    *     inferred NTZ — the reader loads the raw µs verbatim (no tz
    *     conversion), predicates stay natively pushable (PushedFilters),
    *     and every downstream `unix_micros`/`getTimestamp`/window call
    *     sees the one canonical type;
    *   - INT64 nanos: read as long, keep the raw column as `<c>_ns` (a
    *     derived-column predicate can't reach the scan — [[tsAfter]] pushes
    *     the equivalent raw-long bound), rebuild µs via `div 1000`.
    */
  private val tsColumns: Map[String, Seq[String]] = Map(
    "orders"   -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events"   -> Seq("ts"))

  // The probe is a driver-side footer read and a table's physical encoding
  // cannot change within a JVM (regenerations land between rounds —
  // CorpusContractSpec trips the next session), so the amended read schema
  // is memoized per path. Registry queries re-load the same tables dozens
  // of times per Verify/Bench run.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val cols = tsColumns.getOrElse(name, Nil)
    if (cols.isEmpty) return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val amended = schemaCache.computeIfAbsent(path, _ => {
      val inferred = spark.read.parquet(path).schema
      StructType(inferred.map(f =>
        if (cols.contains(f.name) && f.dataType == TimestampNTZType)
          f.copy(dataType = TimestampType)
        else f))
    })
    val raw = spark.read.schema(amended).parquet(path)
    cols.foldLeft(raw) { (df, c) =>
      if (df.schema(c).dataType == LongType)
        df.withColumnRenamed(c, s"${c}_ns")
          .withColumn(c, expr(s"timestamp_micros(${c}_ns div 1000)"))
      else df
    }
  }

  /** Pushdown-friendly watermark predicate on a [[load]]-normalized frame:
    * `c > wmUtc` (µs semantics, the authoritative condition). When the
    * frame carries a legacy raw-nanos twin (`<c>_ns`), the equivalent
    * raw-long bound rides along so Catalyst can push it into the parquet
    * scan (`ts_µs > W  ⇔  ts_ns > W_ns+999`); when `c` is scan-native
    * TimestampType the single predicate is already pushable and the long
    * bound would not resolve.
    */
  def tsAfter(df: DataFrame, c: String, wmUtc: String): Column = {
    val base = col(c) > lit(wmUtc).cast("timestamp")
    if (!df.columns.contains(s"${c}_ns")) base
    else {
      val ldt = java.time.LocalDateTime.parse(wmUtc.replace(' ', 'T'))
      val micros = ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        ldt.getNano / 1000L
      (col(s"${c}_ns") > lit(micros * 1000L + 999L)) && base
    }
  }

  def region(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "lineitem")
  def events(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
