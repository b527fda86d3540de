package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, Trigger, ValueState}

/** Per-key running totals through `transformWithState` — Spark 4's
  * arbitrary-state operator (the successor to `flatMapGroupsWithState`,
  * which [[Sessionize]] exercises): typed state handles (`ValueState` /
  * `ListState` / `MapState`) acquired from a `StatefulProcessorHandle`,
  * per-state TTL, and timers decoupled from the output mode. The engine
  * covers BOTH state APIs so a user of either migrates without leaving it.
  *
  * The operator itself is the simplest genuinely-stateful shape — a
  * running (count, sum) per user emitted every micro-batch in update mode
  * — so the query output isolates the API mechanics: after a bounded
  * drain, each user's LAST emission must equal the all-batch groupBy
  * (oracle-checked), proving state survives across batches and emissions
  * supersede each other in batch order.
  *
  * Determinism: money enters the processor as exact integer cents
  * (`CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)` — the engine's
  * one double→decimal conversion point, same as the ledger), so the state
  * fold is integer arithmetic whose order cannot matter; the single
  * `/100.0` back to double is the last operation on each emitted row.
  *
  * Scale posture: state is one 16-byte value per user in the RocksDB
  * store ([[StateDefaults]] — transformWithState requires the RocksDB
  * provider), partitioned by the group key; update mode ships only the
  * keys each batch touched. TTL is the knob that bounds an unbounded key
  * space (expire users idle past the retention window); the bounded drain
  * keeps `TTLConfig.NONE` because every key must survive to the end for
  * the oracle compare.
  */
object RunningState extends Serializable {

  final case class EventCents(user_id: Long, cents: Long)

  final case class Totals(n_events: Long, sum_cents: Long)

  final case class TotalsOut(user_id: Long, n_events: Long, total_value: Double)

  /** One ValueState[Totals] per user; every batch folds its rows into the
    * state and emits the updated running totals for the keys it saw.
    */
  final class RunningTotalsProcessor
      extends StatefulProcessor[Long, EventCents, TotalsOut] {
    @transient private var totals: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[Totals]("totals",
        Encoders.product[Totals], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[EventCents],
                                 timers: TimerValues): Iterator[TotalsOut] = {
      var cur = if (totals.exists()) totals.get() else Totals(0L, 0L)
      rows.foreach(e => cur = Totals(cur.n_events + 1, cur.sum_cents + e.cents))
      totals.update(cur)
      Iterator.single(TotalsOut(user, cur.n_events, cur.sum_cents / 100.0))
    }
  }

  /** Drain the events file(s) through the processor with AvailableNow and
    * return each user's final running totals — the update-mode emissions
    * are appended with their batch id, and the settled result keeps only
    * each user's newest emission (exactly what an upserting sink would
    * hold). Must equal the batch groupBy bit-for-bit.
    */
  def runningTotalsDrain(spark: SparkSession, sfDir: String,
                         maxFilesPerTrigger: Option[Int] = None,
                         glob: String = "events.parquet"): DataFrame =
      // PINNED RocksDB, not just the default: transformWithState requires
      // state-store column families, which the heap provider lacks — an
      // HDFS opt-out elsewhere in the session must not fail this operator
      StateDefaults.withRocksDB(spark) {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val reader = spark.readStream
      .schema(IncrementalLedger.rawEventSchema)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val events = reader.parquet(sfDir)
      .select(col("user_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .as[EventCents]

    val updates = events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())

    val outDir = graft.stages.TempDirs.scratch("graft_tws_drain_")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = updates.writeStream
        .outputMode(OutputMode.Update)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[TotalsOut], id: Long) =>
          batch.withColumn("_batch", lit(id))
            .write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    val raw = StreamJoin.readDrainOutput(spark, outDir,
      updates.toDF().withColumn("_batch", lit(0L)).schema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("_batch").desc)
    raw.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .select(col("user_id"), col("n_events"), col("total_value"))
  }
}

