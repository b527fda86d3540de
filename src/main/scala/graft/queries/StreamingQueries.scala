package graft.queries

import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.ops.Multimodal
import graft.streaming.IncrementalLedger

/** Streaming + multimodal surfaces as driver-checkable queries: the
  * streaming result must equal the batch oracle (exactly-once drain), and
  * the multimodal stub features are reproducible arithmetic over bytes.
  */
/** Session-cached single-file JSON fixtures for the paginated-API drains.
  * The fixture is a pure function of the corpus dir (fully tie-broken
  * sort), so each (query, dir) builds it exactly once per JVM — repeat
  * verify/bench invocations skip the corpus-wide sort + coalesce(1) write
  * that previously ran per drain. Returns (absolute file path, row count);
  * the count sizes backlog-scaled admission without re-scanning.
  */
object PagedFixture {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** Fingerprint of the corpus behind `sfDir` (events.parquet mtime+size):
    * folded into every cache key so a corpus regenerated WITHIN one JVM
    * session invalidates the fixture instead of silently replaying a
    * stale file (advisor r11).
    */
  private def corpusFingerprint(sfDir: String): String = {
    val f = new java.io.File(s"$sfDir/events.parquet")
    s"${f.lastModified()}_${f.length()}"
  }

  def cached(key: String, sfDir: String)(
      build: => org.apache.spark.sql.DataFrame): (String, Long) =
    cache.computeIfAbsent(s"${key}_${corpusFingerprint(sfDir)}", { _ =>
      val dir = graft.stages.TempDirs.scratch("graft_pfix_")
      build.coalesce(1).write.mode("overwrite").text(s"$dir/api")
      val file = new java.io.File(s"$dir/api").listFiles()
        .filter(_.getName.startsWith("part-")).head.getAbsolutePath
      val lines = java.nio.file.Files.lines(java.nio.file.Paths.get(file))
      val n = try lines.count() finally lines.close()
      (file, n)
    })
}

object StreamingQueries {

  val all: Seq[GQuery] = Seq(

    GQuery("streaming_ledger",
      (s, dir) => IncrementalLedger.monthlyUserTotals(s, dir)
        .orderBy(col("user_id"), col("year"), col("month")),
      Some("""SELECT user_id, CAST(year(ts) AS INT) AS year,
                     CAST(month(ts) AS INT) AS month,
                     COUNT(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM events GROUP BY 1, 2, 3 ORDER BY user_id, year, month"""),
      doc = "Structured Streaming AvailableNow drain == batch aggregation (exactly-once)"),

    GQuery("streaming_lake_merge",
      (s, dir) => IncrementalLedger.monthlyUserTotalsToLake(s, dir)
        .orderBy(col("user_id"), col("year"), col("month")),
      Some("""SELECT user_id, CAST(year(ts) AS INT) AS year,
                     CAST(month(ts) AS INT) AS month,
                     COUNT(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM events GROUP BY 1, 2, 3 ORDER BY user_id, year, month"""),
      doc = "update-mode stream drained through SQL MERGE INTO a lake catalog table " +
        "(exactly-once streaming upsert through the lakehouse surface)"),

    // ---- §2.6 dedup pin under REAL duplicates: two sources feed the same
    // events (full + every-third-id re-delivery); the settled census must
    // equal the single-copy batch aggregate. streaming_ledger's dedup is a
    // pass-through (unique ids); this one actually drops rows.
    GQuery("streaming_dedup_redelivery",
      (s, dir) => IncrementalLedger.redeliveredMonthlyTotals(s, dir)
        .orderBy(col("event_type"), col("year"), col("month")),
      Some("""SELECT event_type, CAST(year(ts) AS INT) AS year,
                     CAST(month(ts) AS INT) AS month,
                     COUNT(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
      doc = "dropDuplicatesWithinWatermark under genuine re-delivery (second " +
        "source re-sends every third event, possibly cross-batch) == " +
        "single-copy batch census"),

    GQuery("streaming_sliding_window",
      (s, dir) => graft.streaming.RunningState.slidingWindowTotalsDrain(s, dir)
        .orderBy(col("window_start")),
      // identical oracle to the batch agg_sliding_time_window entry: the
      // append-mode streaming drain must equal the batch window() plan
      Some("""WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS day, value FROM events),
              w AS (
                SELECT day - i.i AS start_day, value
                FROM d, (SELECT unnest(range(0, 7)) AS i) i)
              SELECT strftime(to_timestamp(start_day * 86400), '%Y-%m-%d') AS window_start,
                     count(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM w GROUP BY start_day ORDER BY window_start"""),
      doc = "append-mode streaming sliding windows: each 7d/1d window emitted once " +
        "when the watermark completes it (sentinel-flushed) == batch window() plan"),

    GQuery("streaming_chained_aggs",
      (s, dir) => graft.streaming.RunningState.chainedDailyAggDrain(s, dir)
        .orderBy(col("day")),
      Some("""WITH d AS (
                SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                       event_type, value
                FROM events),
              a AS (
                SELECT day, event_type, count(*) AS n,
                       SUM(CAST(value AS DECIMAL(18,2))) AS sv
                FROM d GROUP BY day, event_type)
              SELECT day, count(*) AS n_types,
                     CAST(SUM(n) AS BIGINT) AS n_events,
                     CAST(CAST(SUM(sv) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
              FROM a GROUP BY day ORDER BY day"""),
      doc = "two stacked windowed aggregations in ONE streaming query (multiple " +
        "stateful operators): per-(day,type) then per-day, watermark propagated " +
        "through both state stores, append-mode exactly-once emission"),

    GQuery("streaming_tws_running_totals",
      (s, dir) => graft.streaming.RunningState.runningTotalsDrain(s, dir)
        .orderBy(col("user_id")),
      Some("""SELECT user_id, COUNT(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM events GROUP BY user_id ORDER BY user_id"""),
      doc = "transformWithState (Spark 4 arbitrary-state API): ValueState running " +
        "totals per user; each key's last update-mode emission == batch groupBy"),

    // ---- HLL as STREAMING STATE: the live distinct-user counter — 64
    // registers per event type in one ValueState, folded incrementally,
    // running estimate emitted per batch. Same register algebra as the
    // batch sketch, so the drained final emission SHARES
    // sketch_hll_distinct's oracle verbatim: constant state per key where
    // a per-user dedup state grows with the user space.
    GQuery("streaming_hll_state",
      (s, dir) => graft.streaming.SketchState.hllStateDrain(s, dir)
        .orderBy(col("event_type")),
      Some(ScaleOpsQueries.hllOracleSql),
      doc = "HyperLogLog in transformWithState: 64-register ValueState per type, " +
        "incremental fold, final emission == batch sketch (shared oracle) — " +
        "constant-memory streaming cardinality"),

    // ---- CUSUM as STREAMING STATE: the live drift monitor. The
    // order-dependent fold is made streamable by keeping the calendar-
    // bounded day→cents MapState (additive, arrival-order-independent)
    // and deriving the exact trajectory at emission; final drain ==
    // batch ts_cusum, oracle shared verbatim.
    GQuery("streaming_cusum_state",
      (s, dir) => graft.streaming.CusumState.cusumStateDrain(s, dir)
        .orderBy(col("event_type"), col("d")),
      Some(RelationalQueries.cusumOracleSql),
      doc = "CUSUM in transformWithState: calendar-bounded day->cents MapState " +
        "per type, exact trajectory derived per emission; drained final == " +
        "batch ts_cusum (shared oracle)"),

    // ---- Bottom-k sample as STREAMING STATE — the third sketch-state
    // twin: the KMV property (bottom-k of a union is a function of the
    // union only) makes the fold order-insensitive, so the drained state
    // equals the batch sample exactly and shares its oracle verbatim.
    GQuery("streaming_bottomk_state",
      (s, dir) => graft.streaming.SampleState.bottomKStateDrain(s, dir, k = 64)
        .orderBy(col("event_type")),
      Some(ScaleOpsQueries.sampleQuantilesOracle),
      doc = "bottom-k-by-hash sample in transformWithState: k-row ValueState " +
        "per type, order-insensitive KMV fold; drained final == batch " +
        "sketch_sample_quantiles (shared oracle)"),

    // ---- Bitmap as STREAMING STATE (fifth sketch-state twin): the
    // EXACT distinct counter — one bit per dense user id in a ValueState
    // (grown on demand), running count exact at every emission. Bit-set
    // union is order-insensitive, so the drained final per key == the
    // plain batch COUNT(DISTINCT) — the streaming face of the persisted
    // bitmap index (sketch_bitmap_distinct).
    GQuery("streaming_bitmap_state",
      (s, dir) => graft.streaming.SketchState.bitmapStateDrain(s, dir)
        .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users
              FROM events GROUP BY 1 ORDER BY 1"""),
      doc = "exact distinct in transformWithState: per-type user-id bitmap " +
        "ValueState (|ids|/8 bytes, grown on demand), order-insensitive " +
        "bit union; drained final == batch COUNT(DISTINCT) — the exact " +
        "twin of the HLL state at dense-id cost"),

    // ---- Misra-Gries as STREAMING STATE (fourth sketch-state twin): the
    // live per-day heavy-hitter monitor — ≤ k map entries per day key in
    // RocksDB, arrival-order-dependent summary made deterministic by the
    // prune-then-verify tail (union of final per-day candidates → exact
    // recount → integer threshold), so the drained result equals the
    // batch daily rollup and shares sketch_mg_daily_merge's oracle.
    GQuery("streaming_mg_state",
      (s, dir) => graft.streaming.SketchState.mgStateDrain(s, dir, k = 4)
        .orderBy(col("event_type")),
      Some("""WITH n AS (SELECT count(*) AS n FROM events)
              SELECT event_type, count(*) AS n_events
              FROM events GROUP BY event_type
              HAVING count(*) * 5 > (SELECT n FROM n)
              ORDER BY event_type"""),
      doc = "Misra-Gries in transformWithState: k-counter MapState per day, " +
        "decrement-all online fold; final candidates + exact recount == " +
        "batch daily rollup (shared oracle) — bounded-state heavy hitters"),

    // ---- Streaming funnel census: per-user first-occurrence stage times
    // as min-folded ValueState — the order-INSENSITIVE sufficient
    // statistic, so the drained final emissions reproduce the batch
    // conditional-min exactly and the stage census shares funnel_stages'
    // oracle verbatim. Constant 24-byte state per user.
    GQuery("streaming_funnel_state",
      (s, dir) => graft.streaming.RunningState.funnelStageDrain(s, dir)
        .orderBy(col("stage")),
      Some("""WITH f AS (
                SELECT user_id,
                       min(epoch_us(ts)) FILTER (WHERE event_type = 'view') AS t_view,
                       min(epoch_us(ts)) FILTER (WHERE event_type = 'click') AS t_click,
                       min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS t_purchase
                FROM events GROUP BY user_id),
              s AS (
                SELECT user_id,
                       CASE WHEN t_view IS NULL THEN 0
                            WHEN t_click IS NULL OR t_click <= t_view THEN 1
                            WHEN t_purchase IS NULL OR t_purchase <= t_click THEN 2
                            ELSE 3 END AS stage
                FROM f)
              SELECT CAST(stage AS INT) AS stage, count(*) AS n_users
              FROM s GROUP BY stage ORDER BY stage"""),
      doc = "funnel stages in transformWithState: per-user min-folded first-" +
        "occurrence times (order-insensitive state), drained census == batch " +
        "funnel_stages (shared oracle)"),

    GQuery("streaming_interval_join",
      (s, dir) => graft.streaming.StreamJoin.viewPurchasePairs(s, dir, windowMinutes = 30)
        .orderBy(col("user_id"), col("view_event"), col("buy_event")),
      Some("""SELECT v.user_id,
                     v.event_id AS view_event,
                     b.event_id AS buy_event,
                     strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_at,
                     strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS buy_at,
                     b.value AS purchase_value
              FROM events v
              JOIN events b
                ON v.user_id = b.user_id
               AND v.event_type = 'view' AND b.event_type = 'purchase'
               AND epoch_us(b.ts) >= epoch_us(v.ts)
               AND epoch_us(b.ts) <= epoch_us(v.ts) + CAST(30 AS BIGINT) * 60000000
              ORDER BY v.user_id, view_event, buy_event"""),
      doc = "stream-stream interval join (view→purchase attribution): watermarked, state bounded by the time-range condition; streaming result == batch join"),

    GQuery("streaming_semi_join",
      (s, dir) => graft.streaming.StreamJoin.viewPurchaseSemi(s, dir, windowMinutes = 30)
        .orderBy(col("view_event")),
      Some("""SELECT v.user_id,
                     v.event_id AS view_event,
                     strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_at,
                     v.value AS view_value
              FROM events v
              WHERE v.event_type = 'view'
                AND EXISTS (
                  SELECT 1 FROM events b
                  WHERE b.event_type = 'purchase'
                    AND b.user_id = v.user_id
                    AND epoch_us(b.ts) >= epoch_us(v.ts)
                    AND epoch_us(b.ts) <= epoch_us(v.ts) + CAST(30 AS BIGINT) * 60000000)
              ORDER BY view_event"""),
      doc = "LEFT SEMI stream-stream interval join: funnel-conversion filter, each " +
        "converting view emitted exactly once on its first match; no sentinel " +
        "(match-driven emission) — bounded drain == batch EXISTS"),

    GQuery("streaming_anti_join",
      (s, dir) => graft.streaming.StreamJoin.viewPurchaseAnti(s, dir, windowMinutes = 30)
        .orderBy(col("view_event")),
      Some("""SELECT v.user_id,
                     v.event_id AS view_event,
                     strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_at
              FROM events v
              WHERE v.event_type = 'view'
                AND NOT EXISTS (
                  SELECT 1 FROM events b
                  WHERE b.event_type = 'purchase'
                    AND b.user_id = v.user_id
                    AND epoch_us(b.ts) >= epoch_us(v.ts)
                    AND epoch_us(b.ts) <= epoch_us(v.ts) + CAST(30 AS BIGINT) * 60000000)
              ORDER BY view_event"""),
      doc = "LEFT ANTI stream-stream interval join (as the outer drain's null rows " +
        "- Spark's streaming engine rejects a streaming-right LeftAnti): a view " +
        "emitted only once the watermark proves no purchase can arrive; " +
        "sentinel-flushed bounded drain == batch NOT EXISTS"),

    GQuery("streaming_outer_join",
      (s, dir) => graft.streaming.StreamJoin.viewPurchaseLeftOuter(s, dir, windowMinutes = 30)
        .orderBy(col("user_id"), col("view_event"), col("buy_event").asc_nulls_first),
      Some("""SELECT v.user_id,
                     v.event_id AS view_event,
                     b.event_id AS buy_event,
                     strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_at,
                     strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS buy_at,
                     b.value AS purchase_value
              FROM (SELECT * FROM events WHERE event_type = 'view') v
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
                ON v.user_id = b.user_id
               AND epoch_us(b.ts) >= epoch_us(v.ts)
               AND epoch_us(b.ts) <= epoch_us(v.ts) + CAST(30 AS BIGINT) * 60000000
              ORDER BY v.user_id, view_event, buy_event NULLS FIRST"""),
      doc = "LEFT OUTER stream-stream interval join: funnel drop-off rows emitted " +
        "with NULLs when the watermark proves no match can arrive (sentinel-flushed " +
        "bounded drain == batch left join)"),

    GQuery("streaming_full_outer_join",
      (s, dir) => graft.streaming.StreamJoin.viewPurchaseFullOuter(s, dir, windowMinutes = 30)
        .orderBy(col("user_id"), col("view_event").asc_nulls_first,
          col("buy_event").asc_nulls_first),
      Some("""SELECT COALESCE(v.user_id, b.user_id) AS user_id,
                     v.event_id AS view_event,
                     b.event_id AS buy_event,
                     strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_at,
                     strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS buy_at,
                     b.value AS purchase_value
              FROM (SELECT * FROM events WHERE event_type = 'view') v
              FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
                ON v.user_id = b.user_id
               AND epoch_us(b.ts) >= epoch_us(v.ts)
               AND epoch_us(b.ts) <= epoch_us(v.ts) + CAST(30 AS BIGINT) * 60000000
              ORDER BY user_id, view_event NULLS FIRST, buy_event NULLS FIRST"""),
      doc = "FULL OUTER stream-stream interval join: pairs + unconverted views + " +
        "unattributed purchases in one drain; null emission watermark-driven on " +
        "both sides (one sentinel pair flushes both) == batch full join"),

    GQuery("sessionization",
      (s, dir) => graft.streaming.Sessionize.sessionsBatch(
          graft.Tables.events(s, dir).select(col("user_id"), col("ts"), col("value")),
          gapMinutes = 360)
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                              OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > CAST(360 AS BIGINT) * 60000000
                            THEN 1 ELSE 0 END AS new_s
                FROM events),
              sess AS (
                SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS s
                FROM flagged)
              SELECT user_id,
                     strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                     strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                     count(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM sess GROUP BY user_id, s
              ORDER BY user_id, session_start"""),
      doc = "sessionization (gaps-and-islands batch form; flatMapGroupsWithState streaming twin in Sessionize)"),

    GQuery("sessionization_session_window",
      (s, dir) => graft.streaming.Sessionize.sessionsNativeWindow(
          graft.Tables.events(s, dir).select(col("user_id"), col("ts"), col("value")),
          gapMinutes = 360)
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                              OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > CAST(360 AS BIGINT) * 60000000
                            THEN 1 ELSE 0 END AS new_s
                FROM events),
              sess AS (
                SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS s
                FROM flagged)
              SELECT user_id,
                     strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                     strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                     count(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM sess GROUP BY user_id, s
              ORDER BY user_id, session_start"""),
      doc = "sessionization via Spark's native session_window operator (empirically " +
        "verified: an exact-threshold gap MERGES — the same > split boundary as the lag form)"),

    GQuery("sessionization_dynamic_gap",
      (s, dir) => graft.streaming.Sessionize.sessionsDynamicGap(
          graft.Tables.events(s, dir)
            .select(col("user_id"), col("ts"), col("value"), col("event_type")))
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH e AS (
                SELECT user_id, ts, value, epoch_us(ts) AS us,
                       CASE WHEN event_type = 'purchase'
                            THEN CAST(300000000 AS BIGINT)
                            ELSE CAST(21600000000 AS BIGINT) END AS gap_us
                FROM events),
              m AS (
                SELECT *, max(us + gap_us) OVER (PARTITION BY user_id ORDER BY us
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
                FROM e),
              f AS (
                SELECT *, CASE WHEN prev_end IS NULL OR us > prev_end
                               THEN 1 ELSE 0 END AS new_s
                FROM m),
              sess AS (
                SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                           ROWS UNBOUNDED PRECEDING) AS s
                FROM f)
              SELECT user_id,
                     strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                     strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                     count(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM sess GROUP BY user_id, s
              ORDER BY user_id, session_start"""),
      doc = "dynamic-gap sessionization (session_window with a per-event gap column: " +
        "purchase closes in 5 min, browsing idles 360): window merge == per-user " +
        "running-max-of-ends islands, touching windows merge"),

    // ---- CDC → SCD2 through the streaming surface: the ts-ordered change
    // log rides the paginated DSv2 source in several admission-capped
    // micro-batches, and each batch folds into the dimension history via
    // scd2Upsert — the streaming materialization of the warehouse's
    // slowly-changing dimension. Ordered batches are exactly the premise
    // Scd2PropertySpec proves transparent (random ordered splits ==
    // single-shot), so the drained history must equal the full-log oracle.
    // State rides a driver var + lineage cut for the bounded drain; a
    // durable deployment holds it in a MergeTable exactly like
    // streaming_lake_merge's sink.
    GQuery("streaming_scd2_cdc",
      (s, dir) => {
        // fixture file is a pure function of the corpus dir — build it once
        // per session (the scratchStable discipline); re-runs skip the
        // global sort + single-file write entirely
        val (file, nRows) = PagedFixture.cached(s"graft_scd2s_$dir", dir) {
          val ev = Tables.events(s, dir)
          ev.select(col("ts"), col("user_id"), col("event_type"))
            .orderBy(col("ts"), col("user_id"), col("event_type"))
            .select(concat(
              lit("{\"user_id\":"), col("user_id"),
              lit(",\"status\":\""), col("event_type"),
              lit("\",\"delivery_ts\":\""),
              date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), lit("\"}")).as("value"))
        }
        // backlog-scaled admission: the page size is the API's; OUR knob is
        // pages admitted per trigger. A fixed cap meant 13 sequential
        // micro-batches at sf0.1 (fixed per-batch upsert+checkpoint cost
        // dominating the drain); sizing pages/trigger to the backlog holds
        // the drain at ~5 triggers at ANY scale — the admission policy a
        // real catch-up drain runs. Batch-split transparency is
        // Scd2PropertySpec-proven, so the fold is invariant to this knob.
        val pagesPerTrigger = math.max(1L, nRows / 4000L / 5L)
        var state: org.apache.spark.sql.DataFrame = s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("user_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("effective_from",
              org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("effective_to",
              org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("is_current",
              org.apache.spark.sql.types.BooleanType))))
        val q = s.readStream.format("graft.sources.PagedJsonSource")
          .option("path", file)
          .option("pageSize", "4000").option("maxPages", pagesPerTrigger.toString)
          .load()
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                           _: Long) =>
            val changes = batch.toDF().select(
              get_json_object(col("json_response"), "$.user_id")
                .cast("long").as("user_id"),
              get_json_object(col("json_response"), "$.status").as("event_type"),
              col("delivery_ts").cast("timestamp").as("change_ts"))
            state = graft.stages.Merge.scd2Upsert(state, changes,
              Seq("user_id"), Seq("event_type")).localCheckpoint(true)
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        graft.streaming.StateDefaults.awaitDrain(q)
        state.select(col("user_id"), col("event_type"),
            date_format(col("effective_from"), "yyyy-MM-dd HH:mm:ss").as("effective_from"),
            date_format(col("effective_to"), "yyyy-MM-dd HH:mm:ss").as("effective_to"),
            col("is_current"))
          .orderBy(col("user_id"), col("effective_from"))
      },
      Some("""WITH o AS (
                SELECT user_id, event_type, ts,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_type) AS prev
                FROM events),
              ch AS (
                SELECT user_id, event_type, ts FROM o
                WHERE prev IS NULL OR prev <> event_type),
              v AS (
                SELECT user_id, event_type, ts AS f,
                       lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_type) AS t
                FROM ch)
              SELECT user_id, event_type,
                     strftime(f, '%Y-%m-%d %H:%M:%S') AS effective_from,
                     strftime(t, '%Y-%m-%d %H:%M:%S') AS effective_to,
                     t IS NULL AS is_current
              FROM v ORDER BY user_id, effective_from"""),
      doc = "CDC -> SCD2 streamed through the paginated DSv2 source in ordered " +
        "admission-capped micro-batches, folded per batch by scd2Upsert == " +
        "full-log single-shot oracle"),

    // ---- S2 STREAMING form: the paginated API connector as a Structured
    // Streaming source. The events corpus becomes the API's JSONL record
    // stream (the s2_paged_window_scan fixture), drained via
    // Trigger.AvailableNow with the defensive page cap acting as per-trigger
    // admission control (backlog → several paged micro-batches) and the
    // [from,to) window filtering server-side in the readers (the REST
    // query-param form). The drained landing zone is then parsed and
    // aggregated per day — hash-equal to the batch window over parquet,
    // proving the streaming path loses/duplicates nothing.
    GQuery("streaming_paged_source",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val scratch = graft.stages.TempDirs.scratch("graft_pjq_")
        ev.select(concat(
            lit("{\"delivery_id\":\"d"), col("event_id"),
            lit("\",\"order_id\":\"o"), col("event_id"),
            lit("\",\"courier_id\":\"c"), col("user_id"),
            lit("\",\"address\":\"addr\",\"delivery_ts\":\""),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
            lit("\",\"rate\":"),
            get_json_object(col("props"), "$.k").cast("int") % 6,
            lit(",\"sum\":"), col("value").cast("decimal(18,2)").cast("string"),
            lit(",\"tip_sum\":0.00}")).as("value"))
          .coalesce(1).write.mode("overwrite").text(s"$scratch/api")
        val file = new java.io.File(s"$scratch/api").listFiles()
          .filter(_.getName.startsWith("part-")).head.getAbsolutePath
        val q = s.readStream.format("graft.sources.PagedJsonSource")
          .option("path", file)
          .option("pageSize", "20000").option("maxPages", "10")
          .option("from", "2024-01-10 00:00:00").option("to", "2024-01-20 00:00:00")
          .load()
          .writeStream.format("parquet")
          .option("path", s"$scratch/out")
          .option("checkpointLocation", s"$scratch/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        graft.streaming.StateDefaults.awaitDrain(q)
        graft.stages.StgToDds.parseDeliveries(
            s.read.parquet(s"$scratch/out")
              .withColumn("delivery_ts", col("delivery_ts").cast("timestamp")))
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("delivery_day"))
          .agg(count(lit(1)).as("n_deliveries"),
            sum(col("rating").cast("long")).as("rating_sum"),
            sum(col("order_sum")).cast("double").as("sum_total"))
          .orderBy(col("delivery_day"))
      },
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS delivery_day,
                     count(*) AS n_deliveries,
                     CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT) % 6) AS BIGINT)
                       AS rating_sum,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
              FROM events
              WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
                AND ts <  TIMESTAMP '2024-01-20 00:00:00'
              GROUP BY 1 ORDER BY delivery_day"""),
      doc = "S2 streaming form: DSv2 MicroBatchStream over the paginated API " +
        "(page-cap admission control, windowed readers, exactly-once drain) " +
        "== batch window aggregate"),

    // ---- Event-time aggregation INSIDE the stream on the custom DSv2
    // source: the paged connector feeds a watermarked per-day count/sum
    // that closes windows in APPEND mode as the watermark passes them —
    // across several admission-capped micro-batches, with the AvailableNow
    // final no-data batch flushing the tail windows. The fixture is
    // written in event-time order so watermark progression never drops
    // rows and the batch oracle is exact; out-of-order tolerance itself
    // is pinned by the event-corpus streaming queries.
    GQuery("streaming_paged_windowed",
      (s, dir) => {
        val scratch = graft.stages.TempDirs.scratch("graft_pjw_")
        // the trailing sentinel (far beyond the corpus horizon) pushes the
        // final watermark past the last real day's window end so append
        // mode emits it; the sentinel's OWN window ends beyond the
        // watermark and is therefore never emitted — no filtering needed
        // (the StreamJoin sentinel-flush technique, API-stream form).
        // Fixture cached per corpus dir (scratchStable); out/ckpt stay
        // FRESH per run — a reused checkpoint would no-op the drain.
        val (file, nRows) = PagedFixture.cached(s"graft_pjw_$dir", dir) {
          val ev = Tables.events(s, dir)
          ev.select(col("ts"), col("event_id"), col("value"))
            .unionByName(ev.sparkSession.range(1).select(
              expr("timestamp'2024-03-01 00:00:00'").as("ts"),
              lit(-1L).as("event_id"),
              lit(0.0).as("value")))
            .orderBy(col("ts"), col("event_id"))
            .select(concat(
              lit("{\"delivery_id\":\"d"), col("event_id"),
              lit("\",\"delivery_ts\":\""),
              date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
              lit("\",\"sum\":"), col("value").cast("decimal(18,2)").cast("string"),
              lit("}")).as("value"))
        }
        // backlog-scaled admission (see streaming_scd2_cdc): ~4 triggers
        // at any scale instead of a fixed 20k-row cap (6+ at sf0.1)
        val pagesPerTrigger = math.max(1L, nRows / 10000L / 2L)
        val q = s.readStream.format("graft.sources.PagedJsonSource")
          .option("path", file)
          .option("pageSize", "10000").option("maxPages", pagesPerTrigger.toString)
          .load()
          .select(col("delivery_ts").cast("timestamp").as("ts"),
            get_json_object(col("json_response"), "$.sum")
              .cast("decimal(18,2)").as("amount"))
          .withWatermark("ts", "0 seconds")
          .groupBy(window(col("ts"), "1 day").as("w"))
          .agg(count(lit(1)).as("n_deliveries"),
            sum(col("amount")).as("total"))
          .select(date_format(col("w.start"), "yyyy-MM-dd").as("delivery_day"),
            col("n_deliveries"), col("total"))
          .writeStream.format("parquet").outputMode("append")
          .option("path", s"$scratch/out")
          .option("checkpointLocation", s"$scratch/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        graft.streaming.StateDefaults.awaitDrain(q)
        s.read.parquet(s"$scratch/out")
          .select(col("delivery_day"), col("n_deliveries"),
            col("total").cast("double").as("total"))
          .orderBy(col("delivery_day"))
      },
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS delivery_day,
                     count(*) AS n_deliveries,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM events
              GROUP BY 1 ORDER BY delivery_day"""),
      doc = "watermarked event-time windows ON the custom DSv2 streaming " +
        "source, append-mode across admission-capped batches == batch aggregate"),

    GQuery("streaming_static_join",
      (s, dir) => IncrementalLedger.nationMonthlyTotals(s, dir)
        .orderBy(col("c_nationkey"), col("year"), col("month")),
      Some("""SELECT c_nationkey, CAST(year(ts) AS INT) AS year,
                     CAST(month(ts) AS INT) AS month,
                     COUNT(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM events JOIN customer ON user_id = c_custkey
              GROUP BY 1, 2, 3 ORDER BY c_nationkey, year, month"""),
      doc = "stream-static dim enrichment (events stream x customer dim) + update-mode merge == batch join"),

    GQuery("sessionization_streaming",
      (s, dir) => graft.streaming.Sessionize.sessionsStreamingDrain(s, dir, gapMinutes = 360)
        .orderBy(col("user_id"), col("session_start")),
      // identical oracle to the batch `sessionization` entry: the
      // flatMapGroupsWithState drain must equal the gaps-and-islands batch
      Some("""WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                              OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > CAST(360 AS BIGINT) * 60000000
                            THEN 1 ELSE 0 END AS new_s
                FROM events),
              sess AS (
                SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS s
                FROM flagged)
              SELECT user_id,
                     strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                     strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                     count(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM sess GROUP BY user_id, s
              ORDER BY user_id, session_start"""),
      doc = "flatMapGroupsWithState sessionization drained with a sentinel watermark flush == batch gaps-and-islands"),

    GQuery("mm_decode_features",
      (s, dir) => Multimodal.decodeFeatures(
          Multimodal.asMediaTable(s, Tables.documents(s, dir)))
        .toDF()
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, source AS mime,
                     CAST(octet_length(encode(text)) AS INT) AS byte_len,
                     CAST(list_sum(list_transform(range(1, 17),
                       i -> ascii(substr(text, i, 1)))) AS INT) AS brightness_sum,
                     CAST(octet_length(encode(text)) // 256 + 1 AS INT) AS n_frames
              FROM documents ORDER BY doc_id"""),
      doc = "multimodal: binary payload → batched (stub) decode via typed mapPartitions"),

    GQuery("mm_audio_rms",
      (s, dir) => Multimodal.windowRms(
          Multimodal.asMediaTable(s, Tables.documents(s, dir)), windowSamples = 128)
        .orderBy(col("doc_id"), col("window_no")),
      Some("""WITH b AS (
                SELECT doc_id, text, octet_length(encode(text)) AS L FROM documents),
              w AS (
                SELECT doc_id, text, L,
                       unnest(range(0, CAST(ceil(L / 128.0) AS BIGINT))) AS wn
                FROM b),
              sized AS (
                SELECT doc_id, text, wn,
                       CASE WHEN (wn + 1) * 128 <= L THEN 128 ELSE L - wn * 128 END AS n
                FROM w)
              SELECT doc_id, CAST(wn AS INT) AS window_no, CAST(n AS INT) AS n_samples,
                     sqrt(CAST(list_sum(list_transform(range(wn * 128 + 1, wn * 128 + n + 1),
                            j -> CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT)
                                 * CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))) AS DOUBLE) / n) AS rms,
                     CAST(list_max(list_transform(range(wn * 128 + 1, wn * 128 + n + 1),
                            j -> ascii(substr(text, CAST(j AS INT), 1)))) AS INT) AS peak
              FROM sized ORDER BY doc_id, window_no"""),
      // NOTE (shared by all mm_* oracles): the Spark side operates on the
      // payload BYTES — the correct semantics for opaque media — while the
      // DuckDB mirror reads characters via ascii(substr(...)); the two
      // agree because the documents corpus is ASCII (byte == code point).
      // A non-ASCII corpus would need a byte-level oracle, not a Spark fix.
      doc = "multimodal: audio-shaped per-window RMS energy + peak over the opaque payload"),

    // ---- Silence-split segmentation (the VAD deliverable one step past
    // mm_audio_rms's features): integer energy ≥ thr²·n marks speech,
    // consecutive speech windows island into segments. Same stub-codec
    // convention (see mm_audio_rms NOTE: ASCII corpus ⇒ byte == char).
    GQuery("mm_audio_silence_segments",
      (s, dir) => Multimodal.silenceSegments(
          Multimodal.asMediaTable(s, Tables.documents(s, dir)),
          windowSamples = 128, thr = 100)
        .orderBy(col("doc_id"), col("seg_no")),
      Some("""WITH b AS (
                SELECT doc_id, text, octet_length(encode(text)) AS L FROM documents),
              w AS (
                SELECT doc_id, text, L,
                       unnest(range(0, CAST(ceil(L / 128.0) AS BIGINT))) AS wn
                FROM b),
              sized AS (
                SELECT doc_id, text, wn,
                       CASE WHEN (wn + 1) * 128 <= L THEN 128 ELSE L - wn * 128 END AS n
                FROM w),
              en AS (
                SELECT doc_id, CAST(wn AS INT) AS window_no, n,
                       CAST(list_sum(list_transform(range(wn * 128 + 1, wn * 128 + n + 1),
                              j -> CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT)
                                   * CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))) AS BIGINT) AS energy
                FROM sized),
              sp AS (
                SELECT doc_id, window_no, energy,
                       window_no - ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY window_no) AS grp
                FROM en WHERE energy >= 10000 * n),
              seg AS (
                SELECT doc_id, grp, min(window_no) AS start_window,
                       max(window_no) AS end_window, count(*) AS n_windows,
                       CAST(SUM(energy) AS BIGINT) AS energy_sum
                FROM sp GROUP BY doc_id, grp)
              SELECT doc_id,
                     CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY start_window) AS INT) AS seg_no,
                     start_window, end_window, n_windows, energy_sum
              FROM seg ORDER BY doc_id, seg_no"""),
      doc = "multimodal: silence-split VAD segmentation — integer speech " +
        "threshold (energy >= thr^2 * n), gaps-and-islands speech segments"),

    // ---- Image-resize census: k×k integer box downsample of the payload
    // as a 16-wide u8 grid (the thumbnail pass; same stub-codec convention
    // as the other mm_* — MultimodalSpec drives the SAME kernel over real
    // javax.imageio-decoded luma). Per-doc census keeps output O(docs).
    GQuery("mm_image_resize",
      (s, dir) => Multimodal.resizeBoxCensus(
          Multimodal.asMediaTable(s, Tables.documents(s, dir)),
          srcW = 16, factor = 4)
        .orderBy(col("doc_id")),
      Some("""WITH b AS (
                SELECT doc_id, text, octet_length(encode(text)) AS L FROM documents),
              dims AS (
                SELECT doc_id, text, (L // 16) // 4 AS out_h FROM b),
              vals AS (
                SELECT doc_id, out_h,
                       CASE WHEN out_h = 0 THEN CAST([] AS BIGINT[])
                            ELSE list_transform(range(0, out_h * 4), p ->
                              list_sum(list_transform(range(0, 16), q ->
                                CAST(ascii(substr(text,
                                  CAST(((p // 4) * 4 + (q // 4)) * 16
                                       + (p % 4) * 4 + (q % 4) + 1 AS INT),
                                  1)) AS BIGINT))) // 16)
                       END AS v
                FROM dims)
              SELECT doc_id, CAST(out_h AS INT) AS out_h, CAST(4 AS INT) AS out_w,
                     CAST(COALESCE(list_sum(v), 0) AS BIGINT) AS px_sum,
                     CAST(COALESCE(list_min(v), -1) AS INT) AS px_min,
                     CAST(COALESCE(list_max(v), -1) AS INT) AS px_max
              FROM vals ORDER BY doc_id"""),
      doc = "multimodal: 4x4 integer box-downsample census over the 16-wide " +
        "payload grid (thumbnail pass; ragged tail cropped, per-doc census)"),

    // ---- Perceptual-hash near-dup for IMAGES: the pHash shape (coarse
    // spectral signature → sign bits → Hamming near-dup) with the
    // Walsh-Hadamard transform in place of the DCT — WHT is pure integer
    // add/subtract (sign = parity of popcount(i & j)), so the 63-bit
    // signature is EXACT cross-engine where DCT's libm cosines are not.
    // Candidate generation is the SimHash banding discipline: 4 bands ×
    // 16 bits, a pair with Hamming ≤ 3 provably shares an untouched band
    // (pigeonhole), and the exact popcount verify runs only on band
    // collisions — no all-pairs step. Stub 8×8 luma grid = the payload's
    // first 64 bytes (the mm_* codec convention; swapping in a real
    // decoder changes zero plan shape).
    GQuery("mm_phash_neardup",
      // fused native kernel: the layered px/hh/sig HOF formulation is
      // O(64^4) per row after CollapseProject inlines the projections
      // (see functions.WhtSignHash) — the kernel is one O(64^2) pass
      (s, dir) => graft.ops.Multimodal.phashPairs(s, Tables.documents(s, dir))
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 64),
              px AS (SELECT doc_id,
                            list_transform(range(0, 64),
                              j -> CAST(ascii(substr(text, CAST(j AS INT) + 1, 1)) AS BIGINT)) AS px
                     FROM d),
              wht AS (SELECT doc_id,
                             list_transform(range(0, 64), i ->
                               list_sum(list_transform(range(0, 64), j ->
                                 CASE WHEN bit_count(CAST(i AS BIGINT) & j) % 2 = 0
                                      THEN px[CAST(j AS INT) + 1]
                                      ELSE -px[CAST(j AS INT) + 1] END))) AS hh
                      FROM px),
              sig AS (SELECT doc_id,
                             CAST(list_sum(list_transform(range(1, 64), i ->
                               CASE WHEN hh[CAST(i AS INT) + 1] > 0
                                    THEN (CAST(1 AS BIGINT) << CAST(i - 1 AS INT))
                                    ELSE 0 END)) AS BIGINT) AS sig
                      FROM wht),
              bv AS (SELECT doc_id, sig, b, (sig >> CAST(b * 16 AS INT)) & 65535 AS v
                     FROM (SELECT doc_id, sig, unnest(range(0, 4)) AS b FROM sig)),
              cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.sig AS sa,
                              c.doc_id AS doc_b, c.sig AS sb
                       FROM bv a JOIN bv c
                         ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id)
              SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
              FROM cand WHERE bit_count(xor(sa, sb)) <= 3
              ORDER BY doc_a, doc_b"""),
      doc = "perceptual image-hash near-dup: 8x8 Walsh-Hadamard sign signature " +
        "(exact integer spectral hash, the pHash shape without libm DCT) + " +
        "4x16 banded Hamming join, <=3-bit pairs guaranteed by pigeonhole"),

    // ---- Audio fingerprint near-dup (the Shazam constellation shape):
    // per-doc frame-energy peaks hashed as consecutive-peak pairs
    // (e1, e2, Δt packed into one integer), shared-hash pairs verified by
    // a ≥2 co-occurrence threshold — the audio sibling of pHash. The
    // 64-byte stub frames follow the mm_* codec convention (payload bytes
    // as unsigned samples; a real decoder swaps in behind the same
    // algebra). df-capped hash index (≤20): boilerplate fingerprints
    // never fan out — the bounded-df inverted-index discipline.
    GQuery("mm_audio_fingerprint",
      (s, dir) => graft.ops.Multimodal.audioFingerprintPairs(Tables.documents(s, dir))
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH fr AS (
                SELECT doc_id, i.i AS frame_no,
                       list_sum(list_transform(
                         range(1, least(4, length(text) - i.i * 64) + 1),
                         k -> ascii(substr(text, CAST(i.i * 64 + k AS INT), 1)))) AS energy
                FROM documents,
                     (SELECT unnest(range(0, 100)) AS i) i
                WHERE i.i < CAST(ceil(length(text) / 64.0) AS BIGINT)),
              pk AS (
                SELECT doc_id, frame_no, energy FROM (
                  SELECT doc_id, frame_no, energy,
                         lag(energy) OVER w AS prev, lead(energy) OVER w AS next
                  FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY frame_no))
                WHERE prev IS NOT NULL AND next IS NOT NULL
                  AND energy > prev AND energy >= next),
              fp AS (
                SELECT DISTINCT doc_id,
                       energy * 102000 + e2 * 100 + least(f2 - frame_no, 99) AS h
                FROM (
                  SELECT doc_id, frame_no, energy,
                         lead(energy) OVER w AS e2, lead(frame_no) OVER w AS f2
                  FROM pk WINDOW w AS (PARTITION BY doc_id ORDER BY frame_no))
                WHERE e2 IS NOT NULL),
              rare AS (
                SELECT fp.doc_id, fp.h FROM fp
                JOIN (SELECT h, count(*) AS df FROM fp GROUP BY h) d
                  ON d.h = fp.h AND d.df <= 20)
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
              FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 2
              ORDER BY doc_a, doc_b"""),
      doc = "audio-fingerprint near-dup: frame-energy peak constellation " +
        "(consecutive-peak pair hashes, df-capped index), >=2 shared hashes " +
        "per pair — the Shazam shape on the stub codec"),

    // ---- pHash near-dup CLUSTERS: the pairwise census above resolved to
    // transitive clusters (the image-gallery dedup deliverable — keep one
    // representative per visual family). Same pair generation, then the
    // O(log n)-round star CC; oracle = the pair SQL + recursive closure.
    GQuery("mm_phash_clusters",
      (s, dir) => graft.ops.Dedup.connectedComponentsStar(
          graft.ops.Multimodal.phashPairs(s, Tables.documents(s, dir))
            .select(col("doc_a"), col("doc_b")))
        .groupBy(col("comp").as("canonical_doc"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("canonical_doc")),
      Some("""WITH RECURSIVE d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 64),
              px AS (SELECT doc_id,
                            list_transform(range(0, 64),
                              j -> CAST(ascii(substr(text, CAST(j AS INT) + 1, 1)) AS BIGINT)) AS px
                     FROM d),
              wht AS (SELECT doc_id,
                             list_transform(range(0, 64), i ->
                               list_sum(list_transform(range(0, 64), j ->
                                 CASE WHEN bit_count(CAST(i AS BIGINT) & j) % 2 = 0
                                      THEN px[CAST(j AS INT) + 1]
                                      ELSE -px[CAST(j AS INT) + 1] END))) AS hh
                      FROM px),
              sig AS (SELECT doc_id,
                             CAST(list_sum(list_transform(range(1, 64), i ->
                               CASE WHEN hh[CAST(i AS INT) + 1] > 0
                                    THEN (CAST(1 AS BIGINT) << CAST(i - 1 AS INT))
                                    ELSE 0 END)) AS BIGINT) AS sig
                      FROM wht),
              bv AS (SELECT doc_id, sig, b, (sig >> CAST(b * 16 AS INT)) & 65535 AS v
                     FROM (SELECT doc_id, sig, unnest(range(0, 4)) AS b FROM sig)),
              prs AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
                      FROM bv a JOIN bv c
                        ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id
                      WHERE bit_count(xor(a.sig, c.sig)) <= 3),
              edges AS (
                SELECT doc_a AS a, doc_b AS b FROM prs
                UNION ALL SELECT doc_b AS a, doc_a AS b FROM prs),
              reach(node, r) AS (
                SELECT DISTINCT a, a FROM edges
                UNION
                SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
              comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node)
              SELECT comp AS canonical_doc, count(*) AS n_docs
              FROM comp GROUP BY 1 ORDER BY 1"""),
      doc = "pHash near-dup clusters: banded Hamming pairs resolved to " +
        "transitive visual families via star CC == recursive-closure oracle"),

    // ---- Cross-modal near-dup census: the three modality pair tables
    // (text MinHash, image pHash, audio constellation) joined into one
    // per-pair modality profile, then the combination census — the
    // multimodal-corpus QA readout: a pair near-dup in TEXT but not in
    // image/audio is a re-captioned asset; near-dup in image/audio but not
    // text is a re-texted one. Bounded: every input is an existing
    // near-dup pair table (orders below corpus), the union groups by pair
    // key, and the census output is ≤7 combination rows with a
    // deterministic lexicographic example pair each.
    GQuery("mm_crossmodal_neardup",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val tp = graft.ops.Dedup.minhashLshPairs(docs)
          .select(col("doc_a"), col("doc_b"),
            lit(1).as("t"), lit(0).as("im"), lit(0).as("au"))
        val ip = graft.ops.Multimodal.phashPairs(s, docs)
          .select(col("doc_a"), col("doc_b"),
            lit(0).as("t"), lit(1).as("im"), lit(0).as("au"))
        val ap = graft.ops.Multimodal.audioFingerprintPairs(docs)
          .select(col("doc_a"), col("doc_b"),
            lit(0).as("t"), lit(0).as("im"), lit(1).as("au"))
        tp.unionByName(ip).unionByName(ap)
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(max(col("t")).as("in_text"), max(col("im")).as("in_image"),
            max(col("au")).as("in_audio"))
          .groupBy(col("in_text"), col("in_image"), col("in_audio"))
          .agg(count(lit(1)).as("n_pairs"),
            min(struct(col("doc_a"), col("doc_b"))).as("_m"))
          .select(col("in_text"), col("in_image"), col("in_audio"),
            col("n_pairs"), col("_m.doc_a").as("example_a"),
            col("_m.doc_b").as("example_b"))
          .orderBy(col("in_text"), col("in_image"), col("in_audio"))
      },
      Some(s"""WITH tp AS MATERIALIZED (
              |  SELECT doc_a, doc_b FROM (${DedupQueries.minhashPairsSql}) tt),
              |d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 64),
              |px AS (SELECT doc_id,
              |              list_transform(range(0, 64),
              |                j -> CAST(ascii(substr(text, CAST(j AS INT) + 1, 1)) AS BIGINT)) AS px
              |       FROM d),
              |wht AS (SELECT doc_id,
              |               list_transform(range(0, 64), i ->
              |                 list_sum(list_transform(range(0, 64), j ->
              |                   CASE WHEN bit_count(CAST(i AS BIGINT) & j) % 2 = 0
              |                        THEN px[CAST(j AS INT) + 1]
              |                        ELSE -px[CAST(j AS INT) + 1] END))) AS hh
              |        FROM px),
              |sig AS (SELECT doc_id,
              |               CAST(list_sum(list_transform(range(1, 64), i ->
              |                 CASE WHEN hh[CAST(i AS INT) + 1] > 0
              |                      THEN (CAST(1 AS BIGINT) << CAST(i - 1 AS INT))
              |                      ELSE 0 END)) AS BIGINT) AS sig
              |        FROM wht),
              |bv AS (SELECT doc_id, sig, b, (sig >> CAST(b * 16 AS INT)) & 65535 AS v
              |       FROM (SELECT doc_id, sig, unnest(range(0, 4)) AS b FROM sig)),
              |ip AS MATERIALIZED (
              |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
              |  FROM bv a JOIN bv c
              |    ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id
              |  WHERE bit_count(xor(a.sig, c.sig)) <= 3),
              |fr AS (
              |  SELECT doc_id, i.i AS frame_no,
              |         list_sum(list_transform(
              |           range(1, least(4, length(text) - i.i * 64) + 1),
              |           k -> ascii(substr(text, CAST(i.i * 64 + k AS INT), 1)))) AS energy
              |  FROM documents,
              |       (SELECT unnest(range(0, 100)) AS i) i
              |  WHERE i.i < CAST(ceil(length(text) / 64.0) AS BIGINT)),
              |pk AS (
              |  SELECT doc_id, frame_no, energy FROM (
              |    SELECT doc_id, frame_no, energy,
              |           lag(energy) OVER w AS prev, lead(energy) OVER w AS next
              |    FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY frame_no))
              |  WHERE prev IS NOT NULL AND next IS NOT NULL
              |    AND energy > prev AND energy >= next),
              |fp AS (
              |  SELECT DISTINCT doc_id,
              |         energy * 102000 + e2 * 100 + least(f2 - frame_no, 99) AS h
              |  FROM (
              |    SELECT doc_id, frame_no, energy,
              |           lead(energy) OVER w AS e2, lead(frame_no) OVER w AS f2
              |    FROM pk WINDOW w AS (PARTITION BY doc_id ORDER BY frame_no))
              |  WHERE e2 IS NOT NULL),
              |rare AS (
              |  SELECT fp.doc_id, fp.h FROM fp
              |  JOIN (SELECT h, count(*) AS df FROM fp GROUP BY h) dd
              |    ON dd.h = fp.h AND dd.df <= 20),
              |ap AS MATERIALIZED (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2 HAVING count(*) >= 2),
              |allp AS (
              |  SELECT doc_a, doc_b,
              |         max(t) AS in_text, max(im) AS in_image, max(au) AS in_audio
              |  FROM (SELECT doc_a, doc_b, 1 AS t, 0 AS im, 0 AS au FROM tp
              |        UNION ALL SELECT doc_a, doc_b, 0, 1, 0 FROM ip
              |        UNION ALL SELECT doc_a, doc_b, 0, 0, 1 FROM ap) u
              |  GROUP BY 1, 2)
              |SELECT in_text, in_image, in_audio, count(*) AS n_pairs,
              |       min({'doc_a': doc_a, 'doc_b': doc_b}).doc_a AS example_a,
              |       min({'doc_a': doc_a, 'doc_b': doc_b}).doc_b AS example_b
              |FROM allp GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      doc = "cross-modal near-dup census: text-MinHash / image-pHash / " +
        "audio-constellation pair tables joined per pair, modality " +
        "combination counts + example pair — the re-captioned vs re-texted " +
        "asset QA readout"),

    // ---- Shot-boundary detection shape: adjacent-frame signature deltas
    // (here the 4-byte header sum of every 256-byte stub frame) thresholded
    // per document — the temporal-discontinuity pass video curation runs,
    // with the same stub-codec convention as the other mm_* surfaces. The
    // per-doc census keeps output O(docs); the window partitions by doc.
    GQuery("mm_shot_boundaries",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val fr = Multimodal.sampleFrames(
          Multimodal.asMediaTable(s, Tables.documents(s, dir)), everyN = 1)
        val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
        fr.withColumn("delta",
            abs(col("frame_header_sum") - lag(col("frame_header_sum"), 1).over(w)))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_frames"),
            count(when(col("delta") > 40, 1)).as("n_boundaries"),
            coalesce(max(col("delta")), lit(0)).as("max_delta"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH frames AS (
                SELECT doc_id, f.f AS frame_no,
                       CAST(list_sum(list_transform(range(1, 5),
                         i -> CASE WHEN f.f * 256 + i <= length(text)
                                   THEN ascii(substr(text, f.f * 256 + i, 1)) ELSE 0 END)) AS INT)
                         AS hs
                FROM documents,
                     (SELECT unnest(range(0, 64)) AS f) f
                WHERE f.f * 256 < octet_length(encode(text))),
              d AS (SELECT doc_id, frame_no, hs,
                           abs(hs - lag(hs) OVER (PARTITION BY doc_id
                                                  ORDER BY frame_no)) AS delta
                    FROM frames)
              SELECT doc_id, count(*) AS n_frames,
                     count(CASE WHEN delta > 40 THEN 1 END) AS n_boundaries,
                     CAST(COALESCE(max(delta), 0) AS INT) AS max_delta
              FROM d GROUP BY doc_id ORDER BY doc_id"""),
      doc = "multimodal: shot-boundary census (adjacent-frame signature deltas " +
        "thresholded per doc; single-frame docs report zero)"),

    // ---- Keyframe selection — the deliverable the boundary census feeds:
    // frames partition into shots (cumulative boundary count), each shot
    // contributes its brightest frame (struct-argmax, earliest on ties)
    // as the thumbnail/embedding representative. Same stub-codec
    // convention; windows doc-partitioned, shots via one cumulative sum.
    GQuery("mm_keyframe_select",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val fr = Multimodal.sampleFrames(
          Multimodal.asMediaTable(s, Tables.documents(s, dir)), everyN = 1)
        val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
        val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fr.withColumn("delta",
            abs(col("frame_header_sum") - lag(col("frame_header_sum"), 1).over(w)))
          .withColumn("cut", when(col("delta") > 40, lit(1L)).otherwise(lit(0L)))
          .withColumn("shot", sum(col("cut")).over(wCum))
          .groupBy(col("doc_id"), col("shot"))
          .agg(min(col("frame_no")).as("start_frame"),
            count(lit(1)).as("n_frames"),
            max(struct(col("frame_header_sum"), (-col("frame_no")).as("nf")))
              .as("kf"))
          .select(col("doc_id"), col("shot").as("shot_no"),
            col("start_frame"), col("n_frames"),
            (-col("kf.nf")).as("key_frame"),
            col("kf.frame_header_sum").as("key_hs"))
          .orderBy(col("doc_id"), col("shot_no"))
      },
      Some("""WITH frames AS (
                SELECT doc_id, f.f AS frame_no,
                       CAST(list_sum(list_transform(range(1, 5),
                         i -> CASE WHEN f.f * 256 + i <= length(text)
                                   THEN ascii(substr(text, f.f * 256 + i, 1)) ELSE 0 END)) AS INT)
                         AS hs
                FROM documents,
                     (SELECT unnest(range(0, 64)) AS f) f
                WHERE f.f * 256 < octet_length(encode(text))),
              d AS (SELECT doc_id, frame_no, hs,
                           abs(hs - lag(hs) OVER w) AS delta
                    FROM frames
                    WINDOW w AS (PARTITION BY doc_id ORDER BY frame_no)),
              sh AS (SELECT doc_id, frame_no, hs,
                            CAST(SUM(CASE WHEN delta > 40 THEN 1 ELSE 0 END)
                              OVER (PARTITION BY doc_id ORDER BY frame_no
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS shot
                     FROM d)
              SELECT doc_id, shot AS shot_no,
                     CAST(min(frame_no) AS INT) AS start_frame,
                     count(*) AS n_frames,
                     CAST(-(max({'h': hs, 'n': -frame_no}).n) AS INT) AS key_frame,
                     max({'h': hs, 'n': -frame_no}).h AS key_hs
              FROM sh GROUP BY doc_id, shot
              ORDER BY doc_id, shot_no"""),
      doc = "multimodal: per-shot keyframe selection — cumulative-boundary shot " +
        "ids, brightest-frame struct-argmax (earliest on ties) per shot"),

    // ---- Contrast census: the flat/blurred-image pre-filter (variance
    // of luma) before embedding compute — exact integer moments, one
    // terminal division. Same stub-codec convention (ASCII ⇒ byte==char).
    GQuery("mm_image_contrast",
      (s, dir) => Multimodal.contrastCensus(
          Multimodal.asMediaTable(s, Tables.documents(s, dir)))
        .orderBy(col("doc_id")),
      Some("""WITH m AS (
                SELECT doc_id,
                       CAST(octet_length(encode(text)) AS INT) AS n_px,
                       CAST(list_sum(list_transform(range(1, length(text) + 1),
                            j -> CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))) AS BIGINT) AS lum_sum,
                       CAST(list_sum(list_transform(range(1, length(text) + 1),
                            j -> CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT)
                                 * CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))) AS BIGINT) AS lum_sumsq
                FROM documents)
              SELECT doc_id, n_px, lum_sum, lum_sumsq,
                     CAST(n_px * lum_sumsq - lum_sum * lum_sum AS BIGINT) AS var_num,
                     CAST(n_px * lum_sumsq - lum_sum * lum_sum AS DOUBLE)
                       / (CAST(n_px AS DOUBLE) * n_px) AS contrast_var
              FROM m ORDER BY doc_id"""),
      doc = "multimodal: luma-variance contrast census (flat/blur pre-filter) " +
        "— exact integer moments, one terminal double division"),

    GQuery("mm_frame_sample",
      (s, dir) => Multimodal.sampleFrames(
          Multimodal.asMediaTable(s, Tables.documents(s, dir)), everyN = 2)
        .orderBy(col("doc_id"), col("frame_no")),
      Some("""WITH frames AS (
                SELECT doc_id, f.f AS frame_no,
                       CASE WHEN (f.f + 1) * 256 <= octet_length(encode(text))
                            THEN 256 ELSE octet_length(encode(text)) - f.f * 256 END AS frame_bytes,
                       CAST(list_sum(list_transform(range(1, 5),
                         i -> CASE WHEN f.f * 256 + i <= length(text)
                                   THEN ascii(substr(text, f.f * 256 + i, 1)) ELSE 0 END)) AS INT)
                         AS frame_header_sum
                FROM documents,
                     (SELECT unnest(range(0, 64)) AS f) f
                WHERE f.f * 256 < octet_length(encode(text)) AND f.f % 2 = 0)
              SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
                     CAST(frame_bytes AS INT) AS frame_bytes, frame_header_sum
              FROM frames ORDER BY doc_id, frame_no"""),
      doc = "multimodal: every-2nd 256-byte frame sample with header checksum")
  )
}
