package graft.queries

import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.stages.{Merge, StgToDds, Validate}

/** SURVEY.md §2.1 source/sink semantics (S1/S4/S5/S6) as driver-checkable
  * queries. The SCD rewrites run [[Merge]] against a deterministic synthetic
  * increment derived from `customer` (FIXTURES.md §B role mapping), so the
  * oracle can rebuild the same increment in SQL.
  */
object PipelineQueries {

  /** Shared synthetic increment: every 10th customer gets a renamed SCD1
    * update, every 100th also appears as a brand-new key (+10M offset).
    */
  private val incomingSql =
    """SELECT c_custkey, upper(c_name) || '_V2' AS c_name
       FROM customer WHERE c_custkey % 10 = 0
       UNION ALL
       SELECT c_custkey + 10000000 AS c_custkey, 'NEW_' || c_name AS c_name
       FROM customer WHERE c_custkey % 100 = 0"""

  private def incoming(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
    val updates = c.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), concat(upper(col("c_name")), lit("_V2")).as("c_name"))
    val inserts = c.filter(col("c_custkey") % 100 === 0)
      .select((col("c_custkey") + 10000000L).as("c_custkey"),
        concat(lit("NEW_"), col("c_name")).as("c_name"))
    updates.unionByName(inserts)
  }

  val all: Seq[GQuery] = Seq(

    // ---- S7: runtime CHECK constraints → validate-or-quarantine split.
    // A constraint set that genuinely partitions lineitem; the histogram of
    // violation combinations (plus the valid-row count) is the checkable
    // surface of the split.
    GQuery("s7_validate_quarantine",
      (s, dir) => {
        val checks = Seq(
          Validate.Check("discount_le_5pct", col("l_discount") <= 0.05),
          Validate.Check("quantity_le_45", col("l_quantity") <= 45),
          Validate.Check("tax_le_6pct", col("l_tax") <= 0.06))
        // one-pass disposition histogram: the valid bucket is just another
        // group of the SAME scan (a union of the two split branches would
        // read the fact table twice)
        Validate.flag(Tables.lineitem(s, dir), checks)
          .groupBy(when(size(col("_violations")) === 0, lit("(valid)"))
            .otherwise(array_join(col("_violations"), ",")).as("violations"))
          .agg(count(lit(1)).as("n_rows"))
          .orderBy(col("violations"))
      },
      Some("""WITH v AS (
                SELECT list_filter([
                    CASE WHEN NOT (l_discount <= 0.05) THEN 'discount_le_5pct' END,
                    CASE WHEN NOT (l_quantity <= 45) THEN 'quantity_le_45' END,
                    CASE WHEN NOT (l_tax <= 0.06) THEN 'tax_le_6pct' END],
                  x -> x IS NOT NULL) AS viol
                FROM lineitem)
              SELECT CASE WHEN len(viol) = 0 THEN '(valid)'
                          ELSE array_to_string(viol, ',') END AS violations,
                     count(*) AS n_rows
              FROM v GROUP BY 1 ORDER BY violations"""),
      doc = "S7 runtime CHECKs: one-pass validate-or-quarantine disposition histogram"),

    // ---- S1/O1: schema-on-read of an API-shaped JSON payload (load_couriers.py:31)
    // The STG json_response is reconstructed identically in both engines
    // (decimal-string money so double→string formatting never diverges),
    // then parsed with the declared delivery schema via ONE from_json.
    GQuery("s1_stg_parse",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val stg = ev.select(
          concat(
            lit("{\"delivery_id\":\"d"), col("event_id"),
            lit("\",\"order_id\":\"o"), col("event_id"),
            lit("\",\"courier_id\":\"c"), col("user_id"),
            lit("\",\"address\":\"addr\",\"rate\":"),
            get_json_object(col("props"), "$.k").cast("int") % 6,
            lit(",\"sum\":"), col("value").cast("decimal(18,2)").cast("string"),
            lit(",\"tip_sum\":0.00}")).as("json_response"),
          col("ts").as("delivery_ts"))
        StgToDds.parseDeliveries(stg)
          .select(col("delivery_key"), col("order_key"), col("courier_key"),
            col("rating"), col("order_sum").cast("double").as("order_sum"))
          .orderBy(col("delivery_key"))
      },
      Some("""WITH stg AS (
                SELECT '{"delivery_id":"d' || event_id ||
                       '","order_id":"o' || event_id ||
                       '","courier_id":"c' || user_id ||
                       '","address":"addr","rate":' ||
                       (CAST(json_extract_string(props, '$.k') AS INT) % 6) ||
                       ',"sum":' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) ||
                       ',"tip_sum":0.00}' AS json_response
                FROM events)
              SELECT json_extract_string(json_response, '$.delivery_id') AS delivery_key,
                     json_extract_string(json_response, '$.order_id') AS order_key,
                     json_extract_string(json_response, '$.courier_id') AS courier_key,
                     CAST(json_extract_string(json_response, '$.rate') AS INT) AS rating,
                     CAST(CAST(json_extract_string(json_response, '$.sum') AS DECIMAL(14,2)) AS DOUBLE) AS order_sum
              FROM stg ORDER BY delivery_key"""),
      doc = "S1/O1/O2: raw JSON landing → declared-schema extraction"),

    // ---- S2: the time-windowed incremental scan THROUGH the DSv2 paginated
    // connector (load_deliveries.py:40-53): the events corpus is rendered as
    // the API's JSON-lines stream (s1's payload shape plus the delivery_ts
    // field the endpoint windows on), then read back via `paged_json` with a
    // Catalyst `[from, to)` predicate that pushFilters absorbs into the
    // source's window — the Spark-native form of forwarding the watermark
    // interval as REST query params. PlanAuditSpec pins the pushdown
    // (PushedFilters must carry both bounds); this row pins the VALUES.
    GQuery("s2_paged_window_scan",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val apiDir = graft.stages.TempDirs.scratch("graft_api_s2_")
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
          .coalesce(1).write.mode("overwrite").text(apiDir)
        val file = new java.io.File(apiDir).listFiles()
          .filter(_.getName.startsWith("part-")).head.getAbsolutePath
        val windowed = s.read.format("graft.sources.PagedJsonSource")
          .option("path", file)
          .option("pageSize", "10000").option("maxPages", "1000")
          .load()
          .filter(col("delivery_ts") >= "2024-01-10 00:00:00" &&
            col("delivery_ts") < "2024-01-20 00:00:00")
        StgToDds.parseDeliveries(
            windowed.withColumn("delivery_ts", col("delivery_ts").cast("timestamp")))
          .select(col("delivery_key"), col("order_key"), col("courier_key"),
            col("rating"), col("order_sum").cast("double").as("order_sum"),
            date_format(col("ts"), "yyyy-MM-dd").as("delivery_day"))
          .orderBy(col("delivery_key"))
      },
      Some("""WITH stg AS (
                SELECT '{"delivery_id":"d' || event_id ||
                       '","order_id":"o' || event_id ||
                       '","courier_id":"c' || user_id ||
                       '","address":"addr","delivery_ts":"' ||
                       strftime(ts, '%Y-%m-%d %H:%M:%S') ||
                       '","rate":' ||
                       (CAST(json_extract_string(props, '$.k') AS INT) % 6) ||
                       ',"sum":' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) ||
                       ',"tip_sum":0.00}' AS json_response,
                       ts
                FROM events
                WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
                  AND ts <  TIMESTAMP '2024-01-20 00:00:00')
              SELECT json_extract_string(json_response, '$.delivery_id') AS delivery_key,
                     json_extract_string(json_response, '$.order_id') AS order_key,
                     json_extract_string(json_response, '$.courier_id') AS courier_key,
                     CAST(json_extract_string(json_response, '$.rate') AS INT) AS rating,
                     CAST(CAST(json_extract_string(json_response, '$.sum') AS DECIMAL(14,2)) AS DOUBLE) AS order_sum,
                     strftime(ts, '%Y-%m-%d') AS delivery_day
              FROM stg ORDER BY delivery_key"""),
      doc = "S2: [from,to) incremental window read THROUGH the DSv2 paginated " +
        "source — predicate pushdown into the API window, then STG parse"),

    // ---- S4: SCD1 upsert rewrite (load_couriers.py:39-49, couriers_stg_to_dds.sql:21-27)
    GQuery("s4_scd1_upsert",
      (s, dir) => Merge.upsert(
          Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
          incoming(s, dir), Seq("c_custkey"))
        .orderBy(col("c_custkey")),
      Some(s"""WITH incoming AS ($incomingSql)
              SELECT c_custkey, c_name FROM (
                SELECT e.c_custkey, e.c_name FROM customer e
                WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.c_custkey = e.c_custkey)
                UNION ALL
                SELECT c_custkey, c_name FROM incoming)
              ORDER BY c_custkey"""),
      doc = "S4: MERGE-whenMatched-updateAll as anti-join + union"),

    // ---- S5: SCD0 insert-ignore rewrite (load_deliveries.py:55-64, deliveries_stg_to_dds.sql:38-43)
    GQuery("s5_scd0_insert_ignore",
      (s, dir) => Merge.insertIgnore(
          Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
          incoming(s, dir), Seq("c_custkey"))
        .orderBy(col("c_custkey")),
      Some(s"""WITH incoming AS ($incomingSql)
              SELECT c_custkey, c_name FROM (
                SELECT c_custkey, c_name FROM customer
                UNION ALL
                SELECT i.c_custkey, i.c_name FROM incoming i
                WHERE NOT EXISTS (SELECT 1 FROM customer e WHERE e.c_custkey = i.c_custkey))
              ORDER BY c_custkey"""),
      doc = "S5: ON CONFLICT DO NOTHING as left-anti append; existing names survive"),

    // ---- S6: conditional watermark advance with JSON payload (load_deliveries.py:66-80)
    GQuery("s6_watermark_json",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.filter(graft.Tables.tsAfter(ev, "ts", "2024-01-15 00:00:00"))
      }
        .agg(count(lit(1)).as("_n"),
             date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("_max_ts"))
        .filter(col("_n") > 0)
        .select(concat(lit("{\"last_loaded_ts\":\""), col("_max_ts"), lit("\"}"))
          .as("workflow_settings")),
      Some("""SELECT '{"last_loaded_ts":"' || strftime(max(ts), '%Y-%m-%d %H:%M:%S') || '"}'
                       AS workflow_settings
              FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
              HAVING COUNT(*) > 0"""),
      doc = "S6: jsonb_build_object + only-if-nonempty guard"),

    // ---- SCD2 (beyond the reference — it ships only SCD0/SCD1): the full
    // versioned history of each user's event_type, built INCREMENTALLY in
    // two batches through Merge.scd2Upsert (delta-sized: only touched keys
    // rebuild). The oracle is the single-shot full-log reconstruction, so
    // a green row proves batch-split transparency of the incremental path.
    GQuery("scd2_user_status",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts").as("change_ts"))
        val empty = s.createDataFrame(
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
        val cut = "2024-01-15 00:00:00"
        // batch boundary: between incremental loads v1 IS a persisted table,
        // so the lineage cut models reality — uncut, the second upsert
        // replayed the whole first build per reference (11 base scans)
        val v1 = Merge.scd2Upsert(empty,
          ev.filter(col("change_ts") < lit(cut).cast("timestamp")),
          Seq("user_id"), Seq("event_type"))
          .localCheckpoint(true)
        Merge.scd2Upsert(v1,
          ev.filter(col("change_ts") >= lit(cut).cast("timestamp")),
          Seq("user_id"), Seq("event_type"))
          .select(col("user_id"), col("event_type"),
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
      doc = "SCD2 validity-interval history (beyond the reference's SCD0/SCD1): " +
        "incremental two-batch build == single-shot full-log reconstruction"),

    // ---- Point-in-time (PIT) join — the temporal-correctness consumer of
    // SCD2: every fact row joined to the dimension VERSION valid at its
    // event time, never the current one (the leakage-free feature-store /
    // warehouse semantics). The dim history is the user's purchase-tier
    // status (built from purchase events only, so joined facts genuinely
    // differ from it); the join runs as an AS-OF (last version opened at or
    // before the fact ts — intervals chain gaplessly, so that IS the valid
    // interval) via the union+window composition: ONE user-key shuffle, no
    // interval nested-loop, no pair explosion. Facts before a user's first
    // version surface as '(none)', count-preserving.
    GQuery("scd2_pit_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val dimLog = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"),
            concat(lit("tier_"),
              get_json_object(col("props"), "$.k").cast("int") % 3).as("status"),
            col("ts").as("change_ts"))
        val empty = s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("user_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("status",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("effective_from",
              org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("effective_to",
              org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("is_current",
              org.apache.spark.sql.types.BooleanType))))
        val versions = Merge.scd2Upsert(empty, dimLog, Seq("user_id"), Seq("status"))
          .select(col("user_id"), col("status"), col("effective_from"))
        graft.ops.AsOfJoin.asOf(
            ev.select(col("user_id"), col("ts"), col("event_type")),
            versions, Seq("user_id"), "ts", "effective_from", Seq("status"))
          .groupBy(coalesce(col("status"), lit("(none)")).as("status_at_event"),
            col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("status_at_event"), col("event_type"))
      },
      Some("""WITH p AS (
                SELECT user_id,
                       'tier_' || (CAST(json_extract_string(props, '$.k') AS INT) % 3)
                         AS status,
                       ts
                FROM events WHERE event_type = 'purchase'),
              ch AS (
                SELECT user_id, status, ts FROM (
                  SELECT user_id, status, ts,
                         lag(status) OVER (PARTITION BY user_id
                                           ORDER BY ts, status) AS prev
                  FROM p)
                WHERE prev IS NULL OR prev <> status),
              v AS (
                SELECT user_id, status, ts AS f,
                       lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, status) AS t
                FROM ch),
              joined AS (
                SELECT e.user_id, e.event_type,
                       COALESCE(v.status, '(none)') AS status_at_event
                FROM events e LEFT JOIN v
                  ON e.user_id = v.user_id
                 AND e.ts >= v.f AND (v.t IS NULL OR e.ts < v.t))
              SELECT status_at_event, event_type,
                     count(*) AS n_events,
                     count(DISTINCT user_id) AS n_users
              FROM joined GROUP BY 1, 2
              ORDER BY status_at_event, event_type"""),
      doc = "point-in-time join: facts x the SCD2 dim version valid AT EVENT TIME " +
        "(as-of composition, one key shuffle) == oracle interval join"),

    // ---- S3: the watermark read-with-default round trip — the reference's
    // central incremental mechanism (load_deliveries.py:28-38): cold read
    // falls to the default, the increment is bounded by that cursor, the
    // advance persists its max ts, the warm re-read returns it, and a
    // different workflow's cursor stays cold (per-key isolation,
    // srv_wf_settings is keyed by workflow). All four probes ride one real
    // State table (MergeTable-backed, fresh per invocation).
    GQuery("s3_watermark_roundtrip",
      (s, dir) => {
        import s.implicits._
        val statePath = graft.stages.TempDirs.scratch("graft_state_s3_")
        val dflt = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
        val cold = graft.stages.State.readWatermark(s, statePath, "deliveries", dflt)
        // increment bounded by the cursor just read — the S2 scan shape
        val maxTs = graft.stages.State.tsValue(
          Tables.events(s, dir).filter(col("ts") > lit(cold))
            .agg(max(col("ts"))).collect()(0), 0)
        graft.stages.State.advanceWatermark(s, statePath, "deliveries", maxTs)
        val warm = graft.stages.State.readWatermark(s, statePath, "deliveries", dflt)
        val other = graft.stages.State.readWatermark(s, statePath, "other_wf", dflt)
        Seq(("cold", cold), ("warm", warm), ("other_cold", other))
          .toDF("probe", "wm")
          .select(col("probe"),
            date_format(col("wm"), "yyyy-MM-dd HH:mm:ss").as("watermark_ts"))
          .orderBy(col("probe"))
      },
      Some("""SELECT probe, watermark_ts FROM (
                SELECT 'cold' AS probe,
                       strftime(TIMESTAMP '2024-01-01 00:00:00', '%Y-%m-%d %H:%M:%S') AS watermark_ts
                UNION ALL
                SELECT 'warm',
                       strftime(COALESCE((SELECT max(ts) FROM events
                                          WHERE ts > TIMESTAMP '2024-01-01 00:00:00'),
                                         TIMESTAMP '2024-01-01 00:00:00'),
                                '%Y-%m-%d %H:%M:%S')
                UNION ALL
                SELECT 'other_cold',
                       strftime(TIMESTAMP '2024-01-01 00:00:00', '%Y-%m-%d %H:%M:%S'))
              ORDER BY probe"""),
      doc = "S3: watermark cold-default read → bounded increment → advance → warm re-read; per-workflow isolation"),

    // ---- O9: COALESCE((SELECT last_loaded_ts FROM srv_wf_settings WHERE
    // workflow_key = ?), default) — the two branches of the reference's
    // watermark expression (deliveries_stg_to_dds.sql:13-16): a present key
    // returns its stored cursor, an absent key falls to the default.
    GQuery("o9_watermark_coalesce_default",
      (s, dir) => {
        import s.implicits._
        val statePath = graft.stages.TempDirs.scratch("graft_state_o9_")
        val dflt = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
        val seeded = graft.stages.State.tsValue(
          Tables.events(s, dir).agg(max(col("ts"))).collect()(0), 0)
        graft.stages.State.advanceWatermark(s, statePath, "wf_present", seeded)
        val present = graft.stages.State.readWatermark(s, statePath, "wf_present", dflt)
        val absent = graft.stages.State.readWatermark(s, statePath, "wf_absent", dflt)
        Seq(("wf_present", present), ("wf_absent", absent))
          .toDF("workflow_key", "wm")
          .select(col("workflow_key"),
            date_format(col("wm"), "yyyy-MM-dd HH:mm:ss").as("last_loaded_ts"))
          .orderBy(col("workflow_key"))
      },
      Some("""SELECT workflow_key, last_loaded_ts FROM (
                SELECT 'wf_present' AS workflow_key,
                       strftime(COALESCE((SELECT max(ts) FROM events),
                                         TIMESTAMP '2024-01-10 00:00:00'),
                                '%Y-%m-%d %H:%M:%S') AS last_loaded_ts
                UNION ALL
                SELECT 'wf_absent',
                       strftime(COALESCE((SELECT max(ts) FROM events WHERE 1=0),
                                         TIMESTAMP '2024-01-10 00:00:00'),
                                '%Y-%m-%d %H:%M:%S'))
              ORDER BY workflow_key"""),
      doc = "O9: COALESCE watermark default — stored-cursor branch vs default branch")
  )
}
