package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, Trigger}

/** CUSUM changepoint tracking AS STREAMING STATE — the live drift monitor
  * beside [[SketchState]]'s cardinality counter. The trick that makes it
  * streamable: raw CUSUM is an ORDER-DEPENDENT fold (useless under
  * out-of-order arrival), but the per-day cents totals it folds over are
  * plain ADDITIVE state — so the processor keeps one calendar-bounded
  * `MapState[day → cents]` per event type (≤ 31 entries per key for the
  * one-month corpus; O(retention window) in general) accumulated in any
  * arrival order, and derives the full exact trajectory — mean target,
  * prefix sums, running min/max — from the bounded map at each emission.
  * The drained final emission therefore equals the batch `ts_cusum`
  * bit-for-bit and SHARES its oracle verbatim.
  *
  * Scale posture: state per key is the day-count of the retention window,
  * not the event count; emission work is a sort of ≤ |days| entries. The
  * same pattern serves any order-dependent statistic whose sufficient
  * state is a bounded keyed histogram (drawdown, high-water-mark,
  * longest-run).
  */
object CusumState extends Serializable {

  final case class DayCents(event_type: String, d: Long, cents: Long)

  final case class CusumEmit(event_type: String, d: Long, cents: Long,
                             cusum_pos: Long, cusum_neg: Long,
                             changepoint: Boolean)

  final class CusumProcessor extends StatefulProcessor[String, DayCents, CusumEmit] {
    @transient private var days: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      days = getHandle.getMapState[Long, Long]("days",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DayCents],
                                 timers: TimerValues): Iterator[CusumEmit] = {
      rows.foreach { r =>
        val prev = if (days.containsKey(r.d)) days.getValue(r.d) else 0L
        days.updateValue(r.d, prev + r.cents)
      }
      val entries = days.iterator().map(p => (p._1, p._2)).toArray.sortBy(_._1)
      val mu = entries.map(_._2).sum / entries.length // truncating == `div`
      var c = 0L; var minC = 0L; var maxC = 0L
      entries.iterator.map { case (d, cents) =>
        c += cents - mu
        if (c < minC) minC = c
        if (c > maxC) maxC = c
        CusumEmit(key, d, cents, c - minC, maxC - c,
          (c - minC) > mu || (maxC - c) > mu)
      }
    }
  }

  /** Drain the events through the CUSUM state processor (AvailableNow) and
    * return the last batch's full trajectory per type — the exact output
    * contract of `ts_cusum`, shared oracle and all.
    */
  def cusumStateDrain(spark: SparkSession, sfDir: String): DataFrame =
      StateDefaults.withRocksDB(spark) { StateDefaults.withNanosRead(spark) {
    import spark.implicits._
    val events = EventStream.readStream(spark, sfDir, "events.parquet", Map.empty)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .as[DayCents]

    val updates = events
      .groupByKey(_.event_type)
      .transformWithState(new CusumProcessor, TimeMode.None(), OutputMode.Update())

    val outDir = graft.stages.TempDirs.scratch("graft_cusumst_drain_")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = updates.writeStream
        .outputMode(OutputMode.Update)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[CusumEmit], id: Long) =>
          batch.withColumn("_batch", lit(id))
            .write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      StateDefaults.awaitDrain(q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    val raw = StreamJoin.readDrainOutput(spark, outDir,
      updates.toDF().withColumn("_batch", lit(0L)).schema)
    val wMax = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    raw.withColumn("_mb", max(col("_batch")).over(wMax))
      .filter(col("_batch") === col("_mb"))
      .select(col("event_type"), col("d"), col("cents"),
        col("cusum_pos"), col("cusum_neg"), col("changepoint"))
  }}
}
