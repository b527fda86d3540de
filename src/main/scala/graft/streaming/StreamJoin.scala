package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join: attribute each purchase to the view events
  * it followed within `windowMinutes` for the same user — the canonical
  * funnel/attribution join, and the one relational operator whose streaming
  * form REQUIRES engine support (both sides grow unboundedly; neither can
  * be treated as a static dim).
  *
  * Spark-native shape: two watermarked file streams joined on the user key
  * plus a TIME-RANGE condition on the event-time columns. The range bound
  * is what lets the state store evict: a buffered view can only ever match
  * purchases up to `view_ts + window`, so once the purchase-side watermark
  * passes that, the row is dropped — state is O(events in the window), not
  * O(stream). Output mode is append (inner-join matches are final the
  * moment they are emitted), drained through a foreachBatch parquet append
  * — each batch ships only its new pairs.
  *
  * Determinism contract: both engines compare event times in exact integer
  * microseconds (Spark TimestampType IS µs; the oracle uses epoch_us over
  * the ns values, flooring exactly like the engine's ns→µs rebuild), and
  * the output carries no raw timestamps (formatted strings only).
  */
object StreamJoin {

  def viewPurchasePairs(spark: SparkSession, sfDir: String,
                        windowMinutes: Int = 30): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    StateDefaults.ensureRocksDB(spark)
    def eventStream(tpe: String, prefix: String): DataFrame =
      spark.readStream
        .schema(IncrementalLedger.rawEventSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
        .filter(col("event_type") === tpe)
        .select(
          col("user_id").as(s"${prefix}_user"),
          expr("timestamp_micros(ts div 1000)").as(s"${prefix}_ts"),
          col("event_id").as(s"${prefix}_event"),
          col("value").as(s"${prefix}_value"))
        .withWatermark(s"${prefix}_ts", "1 hour")

    val views = eventStream("view", "v")
    val buys = eventStream("purchase", "b")
    val joined = views.join(buys,
      col("v_user") === col("b_user") &&
        col("b_ts") >= col("v_ts") &&
        col("b_ts") <= col("v_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(
        col("v_user").as("user_id"),
        col("v_event").as("view_event"),
        col("b_event").as("buy_event"),
        date_format(col("v_ts"), "yyyy-MM-dd HH:mm:ss").as("view_at"),
        date_format(col("b_ts"), "yyyy-MM-dd HH:mm:ss").as("buy_at"),
        col("b_value").as("purchase_value"))

    val outDir = graft.stages.TempDirs.scratch("graft_sjoin_")
    // stream-stream join keeps FOUR state stores per partition; see the
    // shuffle-partition note in IncrementalLedger.monthlyUserTotals
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = joined.writeStream
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    readDrainOutput(spark, outDir, joined.schema)
  }

  /** Read a foreachBatch parquet-append drain directory. An all-late /
    * zero-match drain appends nothing, so the directory has no part files
    * and parquet schema inference would fail — that one case is a
    * legitimate empty result. Anything else (corrupt part file, permission
    * error) must PROPAGATE: swallowing it would turn a real failure into an
    * empty-but-plausible answer for an oracle-checked query (driver
    * ADVICE.md finding).
    */
  private[graft] def readDrainOutput(spark: SparkSession, outDir: String,
                                         schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val partFiles = Option(new java.io.File(outDir).listFiles())
      .map(_.filter(f => f.isFile && f.getName.startsWith("part-")))
      .getOrElse(Array.empty[java.io.File])
    if (partFiles.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(outDir)
  }
}
