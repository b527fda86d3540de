package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming re-expression of the reference's incremental loop.
  *
  * The reference hand-implements streaming concepts in daily batch
  * (SURVEY.md §2.6): a high-watermark cursor (`srv_wf_settings`), business-
  * key dedup for re-delivery idempotence (UNIQUE + ON CONFLICT), and
  * calendar-month aggregation. Here the same semantics are the engine's
  * native ones: `readStream` file source (new files = new increments — the
  * S2 incremental scan), `withWatermark` + `dropDuplicates` on the business
  * key (cross-batch idempotence), and a keyed aggregation maintained by the
  * streaming state store. `Trigger.AvailableNow` drains everything pending
  * and stops — exactly the reference's daily-batch cadence, checkpointable
  * and restartable.
  *
  * At scale the file source lists partitions incrementally (maxFilesPerTrigger
  * bounds a micro-batch) and state lives per aggregation key in the state
  * store, partitioned by the group key — no driver-side state at all.
  */
object IncrementalLedger {

  /** Raw schema of the events parquet (ts read as INT64 nanos — see
    * graft.Tables; rebuilt to µs TimestampType below).
    */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stream the events file(s), aggregate per (user, year, month), drain with
    * AvailableNow into a memory sink, return the settled result — which must
    * equal the batch computation bit-for-bit (oracle-checked).
    */
  def monthlyUserTotals(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sinkName = s"graft_stream_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"

    val stream = spark.readStream
      .schema(rawEventSchema)
      // file source wants a directory; select just the events table from it
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy(col("user_id"),
        year(col("ts")).as("year"), month(col("ts")).as("month"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
      q.awaitTermination()
    }
    spark.table(sinkName)
  }
}
