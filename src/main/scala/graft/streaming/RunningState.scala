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
      StateDefaults.withRocksDB(spark) { StateDefaults.withNanosRead(spark) {
    import spark.implicits._
    val events = EventStream.readStream(spark, sfDir, glob,
        maxFilesPerTrigger.map(n => "maxFilesPerTrigger" -> n.toString).toMap)
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
      StateDefaults.awaitDrain(q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    val raw = StreamJoin.readDrainOutput(spark, outDir,
      updates.toDF().withColumn("_batch", lit(0L)).schema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("_batch").desc)
    raw.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .select(col("user_id"), col("n_events"), col("total_value"))
  }}

  /** APPEND-mode sliding event-time windows — the streaming twin of the
    * batch `window(ts, 7d, 1d)` aggregation (they share one oracle): each
    * window's row is emitted exactly once, when the watermark proves the
    * window complete (passes its end), which is the semantics a
    * downstream append-only consumer needs (update mode would re-emit a
    * window on every batch that touches it).
    *
    * The bounded drain flushes via the sentinel technique: a single
    * far-future event pushes the final watermark past every REAL
    * window's end. No post-filter is needed — unlike the keyed drains,
    * the sentinel cleans up after itself: its own windows end BEYOND the
    * final watermark (which trails it by the delay), so append mode
    * withholds them, and with the margin > window size + delay it shares
    * no window with any real event.
    */
  def slidingWindowTotalsDrain(spark: SparkSession, sfDir: String): DataFrame =
      StateDefaults.withNanosRead(spark) {
    StateDefaults.ensureRocksDB(spark)
    val maxUs = EventStream.maxTsMicros(spark, sfDir)
    val agged = {
      def windows(df: DataFrame) = df
        .select(col("ts"), col("value"))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "7 days", "1 day"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("window_start"),
          col("n_events"), col("total_value"))
      val us = maxUs.getOrElse {
        return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          windows(EventStream.readStream(spark, sfDir)).schema)
      }
      // margin > window size + watermark delay: the final watermark must
      // pass every real window's end, and the sentinel must share no
      // window with any real event
      val marginUs = (8L * 24 + 2) * 3600L * 1000000L
      val sentinelDir = graft.stages.TempDirs.scratch("graft_swin_sentinel_")
      EventStream.writeSentinel(spark, sentinelDir,
        Seq((-1L, us + marginUs, -1L, "view", 0.0, "{}")))
      windows(EventStream.readStream(spark, sfDir)
        .unionByName(EventStream.sentinelStream(spark, sentinelDir)))
    }
    val outDir = graft.stages.TempDirs.scratch("graft_swin_drain_")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = agged.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      StateDefaults.awaitDrain(q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    StreamJoin.readDrainOutput(spark, outDir, agged.schema)
  }

  /** CHAINED stateful aggregations — two windowed aggs stacked in ONE
    * streaming query (multiple-stateful-operator support, Spark ≥ 3.4):
    * stage 1 aggregates per (1-day window, event_type); stage 2
    * re-windows stage 1's `window` column into the same day and collapses
    * across types. Pre-3.4 engines force an intermediate sink + second
    * query for this shape; here the watermark propagates THROUGH the
    * first stateful operator, so both state stores retire together and
    * each day's final row is emitted exactly once (append mode).
    *
    * Money stays DECIMAL through both aggregation stages (stage 2 sums
    * stage 1's decimal sums — exact, order-free); the one double cast is
    * on the emitted row. Sentinel-flush margin covers both operators'
    * windows: watermark_final ≈ sentinel_ts − delay must pass every real
    * day-window end (≤ max_ts + 1 day), and the sentinel's own windows
    * must end beyond watermark_final so append mode withholds them —
    * 3 days + 2 h satisfies both with day-alignment slack.
    */
  def chainedDailyAggDrain(spark: SparkSession, sfDir: String): DataFrame =
      StateDefaults.withNanosRead(spark) {
    StateDefaults.ensureRocksDB(spark)
    val maxUs = EventStream.maxTsMicros(spark, sfDir)
    val agged = {
      def chain(df: DataFrame) = {
        val daily = df
          .select(col("ts"), col("event_type"), col("value"))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).as("sv"))
        daily
          .groupBy(window(col("window"), "1 day").as("day_w"))
          .agg(count(lit(1)).as("n_types"),
            sum(col("n")).as("n_events"),
            sum(col("sv")).cast("double").as("total_value"))
          .select(date_format(col("day_w.start"), "yyyy-MM-dd").as("day"),
            col("n_types"), col("n_events"), col("total_value"))
      }
      val us = maxUs.getOrElse {
        return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          chain(EventStream.readStream(spark, sfDir)).schema)
      }
      val marginUs = (3L * 24 + 2) * 3600L * 1000000L
      val sentinelDir = graft.stages.TempDirs.scratch("graft_chain_sentinel_")
      EventStream.writeSentinel(spark, sentinelDir,
        Seq((-1L, us + marginUs, -1L, "view", 0.0, "{}")))
      chain(EventStream.readStream(spark, sfDir)
        .unionByName(EventStream.sentinelStream(spark, sentinelDir)))
    }
    val outDir = graft.stages.TempDirs.scratch("graft_chain_drain_")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = agged.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      StateDefaults.awaitDrain(q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    StreamJoin.readDrainOutput(spark, outDir, agged.schema)
  }

  // ---- Streaming funnel state: per-user FIRST-occurrence times of each
  // funnel stage as a ValueState of three min-folded timestamps — the
  // order-INSENSITIVE sufficient statistic (min commutes), so however the
  // stream is batched, the final emission per user equals the batch
  // conditional-min and the drained census shares funnel_stages' oracle.

  final case class StageEvent(user_id: Long, event_type: String, us: Long)
  final case class FunnelFirsts(t_view: Long, t_click: Long, t_purchase: Long)
  final case class FunnelOut(user_id: Long, t_view: Long, t_click: Long,
                             t_purchase: Long)

  /** -1 encodes "stage never seen" (event-time micros are nonnegative). */
  final class FunnelProcessor
      extends StatefulProcessor[Long, StageEvent, FunnelOut] {
    @transient private var firsts: ValueState[FunnelFirsts] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      firsts = getHandle.getValueState[FunnelFirsts]("firsts",
        Encoders.product[FunnelFirsts], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[StageEvent],
                                 timers: TimerValues): Iterator[FunnelOut] = {
      var cur = if (firsts.exists()) firsts.get() else FunnelFirsts(-1L, -1L, -1L)
      def mn(old: Long, t: Long): Long = if (old < 0 || t < old) t else old
      rows.foreach { e =>
        cur = e.event_type match {
          case "view"     => cur.copy(t_view = mn(cur.t_view, e.us))
          case "click"    => cur.copy(t_click = mn(cur.t_click, e.us))
          case "purchase" => cur.copy(t_purchase = mn(cur.t_purchase, e.us))
          case _          => cur
        }
      }
      firsts.update(cur)
      Iterator.single(FunnelOut(user, cur.t_view, cur.t_click, cur.t_purchase))
    }
  }

  /** Drain the events through the funnel state (AvailableNow), take each
    * user's final emission, derive the reached stage (longest strictly-
    * increasing view→click→purchase prefix), and census per stage — the
    * exact output contract of `funnel_stages`, shared oracle.
    */
  def funnelStageDrain(spark: SparkSession, sfDir: String): DataFrame =
      StateDefaults.withRocksDB(spark) { StateDefaults.withNanosRead(spark) {
    import spark.implicits._
    val events = EventStream.readStream(spark, sfDir, "events.parquet", Map.empty)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[StageEvent]

    val updates = events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.None(), OutputMode.Update())

    val outDir = graft.stages.TempDirs.scratch("graft_funnel_drain_")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = updates.writeStream
        .outputMode(OutputMode.Update)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelOut], id: Long) =>
          batch.withColumn("_batch", lit(id))
            .write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      StateDefaults.awaitDrain(q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    val raw = StreamJoin.readDrainOutput(spark, outDir,
      updates.toDF().withColumn("_batch", lit(0L)).schema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("_batch").desc)
    raw.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .withColumn("stage",
        when(col("t_view") < 0, 0)
          .when(col("t_click") < 0 || col("t_click") <= col("t_view"), 1)
          .when(col("t_purchase") < 0 || col("t_purchase") <= col("t_click"), 2)
          .otherwise(3).cast("int"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
  }}
}

