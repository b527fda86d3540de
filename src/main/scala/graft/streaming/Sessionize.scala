package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: group a user's events into sessions separated by
  * > `gapMinutes` of inactivity — the canonical custom-state streaming
  * operator (arbitrary per-key state, not expressible as a windowed
  * aggregate).
  *
  * Two implementations with IDENTICAL results:
  *   - [[sessionsBatch]]: gaps-and-islands over a window (lag → gap flag →
  *     running sum = session index). One shuffle on the user key. This is
  *     the oracle-checkable form.
  *   - [[sessionsStreaming]]: `flatMapGroupsWithState` keeping
  *     (session start, last ts, count, sum) per user, emitting a session
  *     when the gap closes it or the watermark times the key out. State is
  *     O(1) per user, partitioned by key in the state store — the 100 TB
  *     form for unbounded streams.
  */
object Sessionize extends Serializable {

  final case class EventIn(user_id: Long, ts: Timestamp, value: Double)

  final case class SessionState(start: Long, lastTs: Long, n: Int, sumCents: Long)

  final case class SessionOut(
      user_id: Long, session_start: String, session_end: String,
      n_events: Long, total_value: Double)

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** Batch gaps-and-islands: flag rows whose gap from the previous event of
    * the same user exceeds the threshold, cumulative-sum the flags into a
    * session index, aggregate per (user, session).
    */
  def sessionsBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val running = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev", lag(col("ts"), 1).over(byUser))
      .withColumn("_new_session",
        // gap compared in exact microseconds: second-level truncation
        // (unix_timestamp vs DuckDB epoch) can disagree near the boundary
        when(col("_prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("_prev")) > gapMinutes * 60000000L, 1)
          .otherwise(0))
      .withColumn("_session", sum(col("_new_session")).over(running))
      .groupBy(col("user_id"), col("_session"))
      .agg(
        date_format(min(col("ts")), fmt).as("session_start"),
        date_format(max(col("ts")), fmt).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .drop("_session")
  }

  /** The same sessions through Spark's NATIVE `session_window` operator —
    * the declarative form: Catalyst plans the window merge itself
    * (`UpdatingSessionsExec` + a single user-key shuffle in batch; a
    * session-window state store in streaming), no hand-rolled
    * gaps-and-islands. Boundary semantics match [[sessionsBatch]] exactly
    * — verified empirically on Spark 4.1.2: two events exactly
    * `gapMinutes` apart MERGE into one session (the window-overlap test
    * is inclusive), i.e. the same strictly-greater split as the lag form,
    * so both forms share one oracle shape.
    */
  def sessionsNativeWindow(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(
        date_format(min(col("ts")), fmt).as("session_start"),
        date_format(max(col("ts")), fmt).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .drop("session_window")

  /** DYNAMIC-gap sessions through the native `session_window` operator:
    * the idle timeout depends on each EVENT — here a purchase closes its
    * session after 5 minutes while anything else idles 360 — the shape
    * real funnels use (a conversion ends the visit; browsing lingers).
    * Spark merges the per-event windows `[ts, ts+gap)` transitively,
    * touching windows included (same inclusive overlap rule verified for
    * the static form in [[sessionsNativeWindow]]); the oracle mirrors it
    * as a per-user running max of window ends — a new session starts
    * strictly AFTER the max end of every earlier window.
    */
  def sessionsDynamicGap(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"),
        when(col("event_type") === "purchase", lit("5 minutes"))
          .otherwise(lit("360 minutes"))))
      .agg(
        date_format(min(col("ts")), fmt).as("session_start"),
        date_format(max(col("ts")), fmt).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .drop("session_window")

  /** The streaming twin run as a BOUNDED drain over the events file(s),
    * returning exactly the batch result — which makes the
    * `flatMapGroupsWithState` path oracle-checkable, not just spec-tested.
    *
    * The one impedance mismatch of a bounded drain: sessions still open
    * when the files run out never time out, because the watermark stops at
    * `max(ts) - delay`. The drain therefore unions in a SENTINEL stream —
    * one event for pseudo-user -1, far enough past the corpus (gap + delay
    * + margin) that the final watermark passes every real session's idle
    * deadline and the timeout path flushes them all. The sentinel user is
    * filtered from the output; watermarks are global per stream, so one
    * row is all it takes at any corpus size.
    */
  def sessionsStreamingDrain(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                             gapMinutes: Int): DataFrame =
      StateDefaults.withNanosRead(spark) {
    import spark.implicits._
    StateDefaults.ensureRocksDB(spark)
    val real = EventStream.readStream(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"))

    val maxMicros = EventStream.maxTsMicros(spark, sfDir).getOrElse {
      // empty corpus: no sessions, legitimately
      return spark.emptyDataset[SessionOut].toDF()
    }
    val margin = (gapMinutes.toLong + 120L) * 60000000L  // gap + delay + slack
    val sentinelDir = graft.stages.TempDirs.scratch("graft_sess_sentinel_")
    Seq((-1L, maxMicros + margin, 0.0)).toDF("user_id", "us", "value")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"), col("value"))
      .write.mode("overwrite").parquet(sentinelDir)
    val sentinel = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType))))
      .parquet(sentinelDir)

    val sessions = sessionsStreaming(real.unionByName(sentinel).as[EventIn], gapMinutes)
      .filter(col("user_id") >= 0)

    val outDir = graft.stages.TempDirs.scratch("graft_sess_drain_")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = sessions.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: Dataset[SessionOut], _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      StateDefaults.awaitDrain(q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    StreamJoin.readDrainOutput(spark, outDir, sessions.toDF().schema)
  }

  /** Streaming twin: one SessionState per user in the state store; events
    * arrive sorted per micro-batch group, sessions emit on gap — or, for an
    * IDLE user, when the event-time watermark passes `lastTs + gap`
    * (`EventTimeTimeout`): without the timeout an idle user's final session
    * would sit in the state store forever on an unbounded stream, both
    * withholding the row and leaking state. Money is carried as integer
    * cents so merge order cannot affect sums.
    *
    * @param watermarkDelay how much event-time disorder to tolerate before
    *   the watermark (and therefore session timeouts) advances.
    */
  def sessionsStreaming(events: Dataset[EventIn], gapMinutes: Int,
                        watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    StateDefaults.ensureRocksDB(events.sparkSession)
    val gapMs = gapMinutes * 60000L

    def fmtMs(ms: Long): String = {
      val ldt = java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC)
      java.time.format.DateTimeFormatter.ofPattern(fmt).format(ldt)
    }

    def emit(user: Long, s: SessionState): SessionOut =
      SessionOut(user, fmtMs(s.start), fmtMs(s.lastTs), s.n, s.sumCents / 100.0)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[EventIn], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap with no new events: the session
            // is definitively closed (anything later would start a new one).
            val out = state.getOption.map(emit(user, _)).iterator
            state.remove()
            out
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              val cents = math.round(e.value * 100)
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sumCents + cents))
                case Some(s) =>
                  out += emit(user, s)
                  cur = Some(SessionState(t, t, 1, cents))
                case None =>
                  cur = Some(SessionState(t, t, 1, cents))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // the timeout must be strictly beyond the current watermark;
                // a session already older than the watermark times out at the
                // next possible instant.
                state.setTimeoutTimestamp(
                  math.max(s.lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
              case None => state.remove()
            }
            out.iterator
          }
      }
  }
}
