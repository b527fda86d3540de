package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
        df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      else df
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
