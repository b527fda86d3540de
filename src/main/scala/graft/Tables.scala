package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** The corpus stores timestamps as parquet INT64 TIMESTAMP(NANOS) which
    * Spark 4 refuses outright (PARQUET_TYPE_ILLEGAL). We read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild TimestampType at
    * microsecond precision — `ts div 1000` truncates like every engine's
    * ns→µs cast, so oracle comparisons at second/day granularity agree.
    */
  private val tsColumns: Map[String, Seq[String]] = Map(
    "orders"   -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events"   -> Seq("ts"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    tsColumns.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      if (df.schema(c).dataType == org.apache.spark.sql.types.LongType)
        // keep the raw nanos column (`<c>_ns`): predicates on the DERIVED
        // timestamp cannot reach the parquet scan, so watermark filters go
        // through tsAfter() which also pushes the equivalent raw-long bound.
        df.withColumnRenamed(c, s"${c}_ns")
          .withColumn(c, expr(s"timestamp_micros(${c}_ns div 1000)"))
      else df
    }
  }

  /** Pushdown-friendly watermark predicate: `c > wmUtc` (µs semantics, the
    * authoritative condition) AND the equivalent bound on the raw nanos
    * column, which Catalyst CAN push into the parquet scan (PushedFilters +
    * row-group/partition pruning at scale). `ts_µs > W  ⇔  ts_ns > W_ns+999`.
    */
  def tsAfter(c: String, wmUtc: String): Column = {
    val ldt = java.time.LocalDateTime.parse(wmUtc.replace(' ', 'T'))
    val micros = ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
      ldt.getNano / 1000L
    (col(s"${c}_ns") > lit(micros * 1000L + 999L)) &&
      (col(c) > lit(wmUtc).cast("timestamp"))
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
