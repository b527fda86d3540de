package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GQuery, Tables}
import graft.stages.StgToDds

/** SURVEY.md §2.2-2.6 operator inventory over the TPC-H-ish corpus.
  * Every query pins a total row order and keeps money in DECIMAL until the
  * final DOUBLE cast so the DuckDB oracle hash-matches exactly (see
  * Ledger.scala scaladoc for the numeric strategy).
  *
  * Cross-engine cast gotchas encoded here once:
  *   - double→int: Spark truncates, DuckDB rounds → always floor() first;
  *   - year()/month()/row_number(): BIGINT in DuckDB, INT in Spark → CAST
  *     on the oracle side;
  *   - timestamps are never emitted raw (ns vs µs) → date_format strings.
  */
object RelationalQueries {

  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  /** ts_cusum's oracle — shared verbatim by streaming_cusum_state, whose
    * drained final emission must equal the batch trajectory.
    */
  private[queries] val cusumOracleSql: String =
    """WITH daily AS (
         SELECT event_type, epoch_us(ts) // 86400000000 AS d,
                CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
         FROM events GROUP BY 1, 2),
       tgt AS (
         SELECT event_type,
                CAST(SUM(cents) AS BIGINT) // CAST(count(*) AS BIGINT) AS mu
         FROM daily GROUP BY event_type),
       c AS (
         SELECT d.event_type, d.d, d.cents, t.mu,
                SUM(d.cents - t.mu) OVER (PARTITION BY d.event_type
                  ORDER BY d.d ROWS UNBOUNDED PRECEDING) AS c
         FROM daily d JOIN tgt t USING (event_type)),
       s AS (
         SELECT event_type, d, cents, mu,
                c - LEAST(0, MIN(c) OVER w) AS cusum_pos,
                GREATEST(0, MAX(c) OVER w) - c AS cusum_neg
         FROM c WINDOW w AS (PARTITION BY event_type ORDER BY d
                             ROWS UNBOUNDED PRECEDING))
       SELECT event_type, d, cents,
              CAST(cusum_pos AS BIGINT) AS cusum_pos,
              CAST(cusum_neg AS BIGINT) AS cusum_neg,
              (cusum_pos > mu OR cusum_neg > mu) AS changepoint
       FROM s ORDER BY event_type, d"""

  val all: Seq[GQuery] = Seq(

    // ---- O1: JSON field extraction (couriers_stg_to_dds.sql:4, deliveries_stg_to_dds.sql:4-10)
    GQuery("o1_json_extract",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, event_type,
                     CAST(json_extract_string(props, '$.k') AS INT) AS k
              FROM events ORDER BY event_id"""),
      doc = "O1: schema-on-read JSON extraction"),

    // ---- O2: casts / type coercion (deliveries_stg_to_dds.sql:4-10)
    GQuery("o2_scalar_casts",
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast("int").as("qty_int"),
          col("l_extendedprice").cast("decimal(18,2)").cast("string").as("price_dec"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
                     CAST(floor(l_quantity) AS INT) AS qty_int,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
                     strftime(l_shipdate, '%Y-%m-%d') AS ship_date
              FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
      doc = "O2: numeric/date casts with engine-neutral semantics"),

    // ---- O3: watermark filter predicate (deliveries_stg_to_dds.sql:13-16)
    GQuery("o3_watermark_filter",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.filter(graft.Tables.tsAfter(ev, "ts", "2024-01-15 00:00:00"))
      }
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS day
              FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
              ORDER BY event_id"""),
      doc = "O3: incremental scan restriction; literal predicate reaches the parquet scan"),

    // ---- O4: DISTINCT projection (couriers_stg_to_dds.sql:3-5)
    GQuery("o4_distinct_projection",
      (s, dir) => Tables.events(s, dir)
        .select(col("user_id"), col("event_type")).distinct()
        .orderBy(col("user_id"), col("event_type")),
      Some("""SELECT DISTINCT user_id, event_type FROM events
              ORDER BY user_id, event_type"""),
      doc = "O4/A5: dedup-before-join building block"),

    // ---- O5: timestamp decomposition → timestamp dim (timestamps_stg_to_dds.sql:12-19)
    GQuery("o5_timestamp_dim",
      (s, dir) => StgToDds.timestampDimRows(
          Tables.events(s, dir).select(col("ts")))
        .select(
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("year"), col("month"), col("day"), col("time"),
          col("date").cast("string").as("date"))
        .orderBy(col("ts_s"), col("time")),
      Some("""SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                     CAST(year(ts) AS INT) AS year,
                     CAST(month(ts) AS INT) AS month,
                     CAST(day(ts) AS INT) AS day,
                     strftime(ts, '%H:%M:%S') AS time,
                     strftime(ts, '%Y-%m-%d') AS date
              FROM (SELECT DISTINCT ts FROM events)
              ORDER BY ts_s, time"""),
      doc = "O5: calendar attributes of the distinct timestamp set"),

    // ---- A1: ungrouped MAX → watermark cursor (deliveries_stg_to_dds.sql:19-21)
    GQuery("a1_max_watermark",
      (s, dir) => Tables.events(s, dir)
        .agg(date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_loaded_ts")),
      Some("""SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_loaded_ts
              FROM events"""),
      doc = "A1: scalar max as the progress cursor"),

    // ---- A2: scalar COUNT guard (load_deliveries.py:67-70)
    GQuery("a2_count_guard",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.filter(graft.Tables.tsAfter(ev, "ts", "2024-01-15 00:00:00"))
      }
        .agg(count(lit(1)).as("n_rows")),
      Some("""SELECT COUNT(*) AS n_rows FROM events
              WHERE ts > TIMESTAMP '2024-01-15 00:00:00'"""),
      doc = "A2: non-empty-increment guard before advancing the watermark"),

    // ---- A3: multi-key hash aggregation, TPC-H Q1 shape (courier_ledger_update.sql:2-25)
    GQuery("a3_pricing_summary",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val price = col("l_extendedprice").cast("decimal(18,2)")
        val disc = col("l_discount").cast("decimal(4,2)")
        val tax = col("l_tax").cast("decimal(4,2)")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(price).cast("double").as("sum_base_price"),
            sum(price * (lit(BigDecimal(1)) - disc)).cast("double").as("sum_disc_price"),
            sum(price * (lit(BigDecimal(1)) - disc) * (lit(BigDecimal(1)) + tax))
              .cast("double").as("sum_charge"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", col("sum_qty") / col("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
                     SUM(l_quantity) AS sum_qty,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
                     COUNT(*) AS count_order,
                     SUM(l_quantity) / COUNT(*) AS avg_qty
              FROM lineitem
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus"""),
      doc = "A3: grouped sums with exact decimal arithmetic (sum_qty is integral-valued double → order-independent)"),

    // ---- A4: conditional aggregate — FILTER clause (courier_ledger_update.sql:10)
    GQuery("a4_filtered_avg",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,2)"))).as("_psum"),
          count(when(col("event_type") === "purchase", lit(1))).as("n_purchases"))
        .select(col("user_id"), col("n_purchases"),
          when(col("n_purchases") > 0,
            col("_psum").cast("double") / col("n_purchases")).as("purchase_avg"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
                     COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
                     CASE WHEN COUNT(*) FILTER (WHERE event_type = 'purchase') > 0
                          THEN CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
                               / COUNT(*) FILTER (WHERE event_type = 'purchase')
                     END AS purchase_avg
              FROM events GROUP BY user_id ORDER BY user_id"""),
      doc = "A4: FILTER aggregate as sum(when)/count(when), exact division"),

    // ---- J1: dim lookup join, dedup before join (couriers_stg_to_dds.sql:12-19)
    GQuery("j1_dim_lookup",
      (s, dir) => Tables.events(s, dir)
        .select(col("user_id")).distinct()
        .join(broadcast(Tables.customer(s, dir)),
          col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_name").as("courier_name"))
        .orderBy(col("user_id")),
      Some("""SELECT DISTINCT e.user_id, c.c_name AS courier_name
              FROM events e JOIN customer c ON e.user_id = c.c_custkey
              ORDER BY e.user_id"""),
      doc = "J1: broadcast dim lookup; distinct first, join second"),

    // ---- J2: fact key resolution via surrogate-id dims (deliveries_stg_to_dds.sql:23-36)
    GQuery("j2_fact_key_resolution",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val dmCouriers = StgToDds.withSurrogateId(
          ev.select(col("user_id")).distinct(), "courier_sk", col("user_id"))
        // timestamp dim is |events|-scale → use the distributed id assignment
        val dmTs = StgToDds.withSurrogateIdScalable(
          ev.select(col("ts")).distinct(), "ts_sk", col("ts"))
        ev.join(broadcast(dmCouriers), Seq("user_id"))
          // ts dim is fact-scale: no broadcast hint — AQE picks the join
          .join(dmTs, Seq("ts"))
          .select(col("event_id"), col("courier_sk"), col("ts_sk"))
          .orderBy(col("event_id"))
      },
      Some("""WITH dm_couriers AS (
                SELECT user_id, CAST(ROW_NUMBER() OVER (ORDER BY user_id) AS INT) AS courier_sk
                FROM (SELECT DISTINCT user_id FROM events)
              ), dm_ts AS (
                SELECT ts, CAST(ROW_NUMBER() OVER (ORDER BY ts) AS INT) AS ts_sk
                FROM (SELECT DISTINCT ts FROM events)
              )
              SELECT e.event_id, c.courier_sk, t.ts_sk
              FROM events e
              JOIN dm_couriers c ON e.user_id = c.user_id
              JOIN dm_ts t ON e.ts = t.ts
              ORDER BY e.event_id"""),
      doc = "J2: business keys → deterministic surrogate ids, incl. exact timestamp-equality join"),

    // ---- J3: snowflake denormalization join + aggregate (courier_ledger_update.sql:13-19)
    GQuery("j3_snowflake_revenue",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        val revenue = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)) - col("l_discount").cast("decimal(4,2)"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
          .agg(
            sum(revenue).cast("double").as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"))
          .orderBy(col("r_name"), col("order_year"))
      },
      Some("""SELECT r.r_name, CAST(year(o.o_orderdate) AS INT) AS order_year,
                     CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
                     COUNT(DISTINCT o.o_orderkey) AS n_orders
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              GROUP BY r.r_name, order_year
              ORDER BY r.r_name, order_year"""),
      doc = "J3: 4-hop snowflake join, dims broadcast, fact shuffles once for the agg"),

    // ---- left-semi (implied by upsert semantics, SURVEY.md §2.3 note)
    GQuery("join_semi",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer c
              WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
              ORDER BY c_custkey"""),
      doc = "left_semi = EXISTS"),

    // ---- left-anti (implied by insert-ignore semantics)
    GQuery("join_anti",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_totalprice") > 300000).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
              ORDER BY c_custkey"""),
      doc = "left_anti = NOT EXISTS (customers with no 300k+ order)"),

    // ---- T1/T2: ordered scan + limit (load_couriers.py:10-13)
    GQuery("t1_topk_orders",
      (s, dir) => Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date")),
      Some("""SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS order_date
              FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
      doc = "T1+T2: global sort + limit → Spark TakeOrderedAndProject (no full sort materialization)"),

    // ---- Window: top-N per group (engine-completeness beyond the reference, SURVEY.md §2.6)
    GQuery("w1_topn_per_customer",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders)
              WHERE rn <= 3 ORDER BY o_custkey, rn"""),
      doc = "window row_number top-N per key; partitioned window → one shuffle on the key"),

    // ---- Grouping sets beyond the reference: ROLLUP subtotals.
    // NULL ordering is a cross-engine trap: Spark sorts NULLS FIRST asc,
    // DuckDB NULLS LAST — the oracle pins NULLS FIRST explicitly.
    GQuery("agg_rollup",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .rollup(col("o_orderpriority"), year(col("o_orderdate")).as("order_year"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("total"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority").asc_nulls_first, col("order_year").asc_nulls_first)
      },
      Some("""SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS order_year,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                     COUNT(*) AS n
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY ROLLUP (o_orderpriority, order_year)
              ORDER BY o_orderpriority ASC NULLS FIRST, order_year ASC NULLS FIRST"""),
      doc = "ROLLUP subtotal hierarchy (engine-completeness beyond the reference)"),

    // Spark's native sliding event-time window operator: each event lands
    // in size/slide = 7 epoch-aligned windows, planned as an Expand
    // (per-row fan-out) + one hash aggregate — the batch twin of the
    // streaming windowed aggregation. Oracle re-derives the assignment
    // from epoch-day arithmetic (UTC session TZ; window starts are
    // epoch-aligned multiples of the slide, exactly Spark's contract).
    GQuery("agg_sliding_time_window",
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "7 days", "1 day"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("window_start"),
          col("n_events"), col("total_value"))
        .orderBy(col("window_start")),
      Some("""WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS day, value FROM events),
              w AS (
                SELECT day - i.i AS start_day, value
                FROM d, (SELECT unnest(range(0, 7)) AS i) i)
              SELECT strftime(to_timestamp(start_day * 86400), '%Y-%m-%d') AS window_start,
                     count(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM w GROUP BY start_day ORDER BY window_start"""),
      doc = "sliding event-time windows (7-day size, 1-day slide) via Spark's native " +
        "window() operator == epoch-day fan-out oracle"),

    // Ranking family over one window: the four rank flavors differ exactly
    // where ties and partition size interact; percent_rank/cume_dist are
    // exact rational divisions (cross-engine bit-identical).
    GQuery("w4_ranks",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"), col("c_custkey"))
        Tables.customer(s, dir)
          .select(col("c_nationkey"), col("c_custkey"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cdist"))
          .filter(col("c_custkey") % 10 === 0)
          .orderBy(col("c_nationkey"), col("c_custkey"))
      },
      Some("""SELECT c_nationkey, c_custkey,
                     CAST(rank() OVER w AS INT) AS rnk,
                     CAST(dense_rank() OVER w AS INT) AS drnk,
                     CAST(ntile(4) OVER w AS INT) AS quartile,
                     percent_rank() OVER w AS pct_rank,
                     cume_dist() OVER w AS cdist
              FROM customer
              WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
              QUALIFY c_custkey % 10 = 0
              ORDER BY c_nationkey, c_custkey"""),
      doc = "rank/dense_rank/ntile/percent_rank/cume_dist over one window (tie and " +
        "partition-size semantics; the percent forms are exact rational divisions)"),

    // Window navigation: lag/lead deltas and per-partition first/last.
    GQuery("w3_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wAll = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .select(col("user_id"), col("event_id"),
            (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"),
            lead(col("event_id"), 1).over(w).as("next_event"),
            first(col("event_id")).over(wAll).as("first_event"),
            last(col("event_id")).over(wAll).as("last_event"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
                     value - lag(value, 1) OVER w AS delta_prev,
                     lead(event_id, 1) OVER w AS next_event,
                     first_value(event_id) OVER w2 AS first_event,
                     last_value(event_id) OVER w2 AS last_event
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                     w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY user_id, event_id"""),
      doc = "window navigation: lag delta, lead, first/last value per partition"),

    // Correlated scalar subquery through the SQL surface — Catalyst
    // decorrelates it into the join+aggregate a hand-written plan would be.
    GQuery("sql_correlated",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("v_orders2")
        Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem2")
        s.sql("""
          SELECT o_orderkey,
                 (SELECT COUNT(*) FROM v_lineitem2 l
                  WHERE l.l_orderkey = o.o_orderkey) AS n_lines
          FROM v_orders2 o
          WHERE o_orderkey <= 1000
          ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey,
                     (SELECT COUNT(*) FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey) AS n_lines
              FROM orders o
              WHERE o_orderkey <= 1000
              ORDER BY o_orderkey"""),
      doc = "correlated scalar subquery (decorrelated by Catalyst into join+agg)"),

    // PIVOT with an explicit value list (deterministic column set); FILTER
    // counts in the oracle return 0 like the filled pivot.
    GQuery("agg_pivot",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
                     COUNT(*) FILTER (WHERE event_type = 'click') AS click,
                     COUNT(*) FILTER (WHERE event_type = 'error') AS error,
                     COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                     COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
                     COUNT(*) FILTER (WHERE event_type = 'view') AS view
              FROM events GROUP BY user_id ORDER BY user_id"""),
      doc = "PIVOT event-type histogram per user (explicit value list, fill-0)"),

    // UNPIVOT (melt): the pivot round-trips back to the long-form
    // histogram — dropping the fill-0 cells recovers exactly GROUP BY.
    GQuery("agg_unpivot",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .unpivot(Array(col("user_id")),
          Array(col("click"), col("error"), col("purchase"), col("signup"), col("view")),
          "event_type", "n")
        .filter(col("n") > 0)
        .orderBy(col("user_id"), col("event_type")),
      Some("""SELECT user_id, event_type, count(*) AS n
              FROM events GROUP BY 1, 2 ORDER BY user_id, event_type"""),
      doc = "UNPIVOT/melt: pivot→unpivot round-trip equals the long-form GROUP BY"),

    // String-function suite over customer names (pure projection; every
    // function deterministic integer/string outputs on both engines).
    GQuery("o13_string_funcs",
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_name")).as("lo"),
          length(col("c_name")).as("len"),
          substring(col("c_name"), 1, 8).as("head8"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
          lpad(col("c_custkey").cast("string"), 9, "0").as("padded_key"),
          levenshtein(col("c_name"), lit("Customer")).as("lev"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
                     upper(c_name) AS up,
                     lower(c_name) AS lo,
                     CAST(length(c_name) AS INT) AS len,
                     substr(c_name, 1, 8) AS head8,
                     regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
                     lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded_key,
                     CAST(levenshtein(c_name, 'Customer') AS INT) AS lev
              FROM customer ORDER BY c_custkey"""),
      doc = "string functions: case, slice, regex mask, pad, edit distance"),

    // Calendar arithmetic: diff/truncation/month-end — string/int outputs
    // only (the ns-timestamp output rule).
    GQuery("o12_date_arith",
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
          datediff(col("l_shipdate").cast("date"), lit("2022-01-01").cast("date"))
            .as("days_since"),
          date_format(last_day(col("l_shipdate")), "yyyy-MM-dd").as("month_end"),
          date_format(date_trunc("week", col("l_shipdate")), "yyyy-MM-dd").as("week_start"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
                     strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
                     CAST(date_diff('day', DATE '2022-01-01', CAST(l_shipdate AS DATE)) AS INT) AS days_since,
                     strftime(last_day(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS month_end,
                     strftime(date_trunc('week', CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS week_start
              FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
      doc = "date arithmetic: day diff, ISO-week truncation, month end"),

    // The skew tool as a checkable query: deterministic two-phase salted
    // aggregation must equal the plain GROUP BY the oracle runs.
    GQuery("agg_salted",
      (s, dir) => graft.stages.Skew.saltedAggregate(
          Tables.events(s, dir)
            .withColumn("value_d", col("value").cast("decimal(18,2)")),
          keys = Seq("event_type"), saltFrom = Seq(col("event_id")), salts = 16,
          sums = Seq("value_d"))
        .select(col("event_type"),
          col("value_d").cast("double").as("total_value"), col("n_rows"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
                     COUNT(*) AS n_rows
              FROM events GROUP BY event_type ORDER BY event_type"""),
      doc = "deterministic salted two-phase aggregation == plain GROUP BY (skew tool, oracle-proven)"),

    // Sliding ROWS frame (the window-function class w1's rank doesn't
    // cover): decimal-exact frame sum, one final double division.
    GQuery("w2_moving_avg",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-3, 0)
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("mov_sum_d", sum(col("value").cast("decimal(18,2)")).over(w))
          .withColumn("mov_n", count(lit(1)).over(w))
          .select(col("user_id"), col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("at"),
            col("mov_sum_d").cast("double").as("mov_sum"),
            (col("mov_sum_d").cast("double") / col("mov_n").cast("double")).as("mov_avg"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
                     strftime(ts, '%Y-%m-%d %H:%M:%S') AS at,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mov_sum,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                       / CAST(COUNT(*) OVER w AS DOUBLE) AS mov_avg
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
              ORDER BY user_id, event_id"""),
      doc = "sliding ROWS-frame moving sum/avg per user (decimal-exact frame arithmetic)"),

    // Time-RANGE frame — the window class w2's ROWS frame can't express:
    // "everything in the trailing 7 days", however many rows that is.
    // Ordering is on µs epoch longs (`unix_micros` == DuckDB `epoch_us`)
    // so the frame bounds are exact integers in both engines; a RANGE
    // frame also includes ALL ties of the current order value, which is
    // engine-independent given identical ordering longs.
    GQuery("w5_range_interval_frame",
      (s, dir) => {
        val sevenDaysUs = 7L * 86400 * 1000000
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("at_us"))
          .rangeBetween(-sevenDaysUs, 0)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            unix_micros(col("ts")).as("at_us"),
            col("value").cast("decimal(18,2)").as("value_d"))
          .withColumn("n_7d", count(lit(1)).over(w))
          .withColumn("sum_7d", sum(col("value_d")).over(w).cast("double"))
          .select(col("user_id"), col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("at"),
            col("n_7d"), col("sum_7d"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
                     strftime(ts, '%Y-%m-%d %H:%M:%S') AS at,
                     COUNT(*) OVER w AS n_7d,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_7d
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                           RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
              ORDER BY user_id, event_id"""),
      doc = "trailing-7-day RANGE window frame per user: time-valued frame bounds " +
        "on exact µs epoch ordering (the rows-vs-range distinction at scale)"),

    // Higher-order array functions — the lambda surface (transform /
    // filter / exists / aggregate) that makes array columns first-class
    // without exploding them: per-row, codegen-free but shuffle-free.
    GQuery("o15_higher_order_arrays",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          size(expr("filter(toks, t -> length(t) > 6)")).as("n_long"),
          expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))").as("sum_len"),
          expr("exists(toks, t -> length(t) >= 12)").as("has_giant"),
          expr("array_join(transform(slice(toks, 1, 3), t -> upper(t)), ' ')")
            .as("head3_upper"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
              SELECT doc_id,
                     CAST(len(toks) AS INT) AS n_tokens,
                     CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
                     CAST(len(list_filter(toks, t -> length(t) > 6)) AS INT) AS n_long,
                     CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_len,
                     len(list_filter(toks, t -> length(t) >= 12)) > 0 AS has_giant,
                     array_to_string(list_transform(toks[1:3], t -> upper(t)), ' ') AS head3_upper
              FROM t ORDER BY doc_id"""),
      doc = "higher-order array lambdas: filter/transform/exists/aggregate/slice over " +
        "token arrays — array analytics without a Generate fan-out"),

    // Per-group MODE — the most-frequent value, the aggregate engines
    // disagree on most (tie-breaking is engine-private in both Spark's
    // `mode` and DuckDB's `mode`), so it is spelled as count + rank with
    // an EXPLICIT deterministic tie-break (higher count, then
    // lexicographic value): cross-engine exact and partitioning-stable.
    GQuery("agg_mode_per_group",
      (s, dir) => {
        val counts = Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("n").desc, col("event_type"))
        counts.withColumn("_r", row_number().over(w))
          .filter(col("_r") === 1)
          .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (
                SELECT user_id, event_type, count(*) AS n
                FROM events GROUP BY user_id, event_type),
              r AS (
                SELECT user_id, event_type, n,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY n DESC, event_type) AS rr
                FROM c)
              SELECT user_id, event_type AS mode_type, n
              FROM r WHERE rr = 1 ORDER BY user_id"""),
      doc = "per-user modal event type via count + rank with an explicit " +
        "deterministic tie-break (native mode() tie-breaking is engine-private)"),

    // NULL semantics surface — the comparisons every engine defines
    // differently enough to bite: NULLIF manufactures the nulls
    // deterministically, then COALESCE defaulting, three-valued `=`
    // (null), and NULL-SAFE equality (`<=>` == IS NOT DISTINCT FROM,
    // false not null) are emitted side by side per row.
    GQuery("o17_null_semantics",
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"),
          expr("nullif(c_mktsegment, 'BUILDING')").as("seg_n"))
        .select(col("c_custkey"),
          col("seg_n").isNull.as("is_null"),
          coalesce(col("seg_n"), lit("<none>")).as("seg_or_default"),
          (col("seg_n") === "MACHINERY").as("eq_3vl"),
          (col("seg_n") <=> "MACHINERY").as("eq_nullsafe"),
          (col("seg_n") <=> lit(null.asInstanceOf[String])).as("is_null_nullsafe"))
        .orderBy(col("c_custkey")),
      Some("""WITH n AS (
                SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg_n
                FROM customer)
              SELECT c_custkey,
                     seg_n IS NULL AS is_null,
                     COALESCE(seg_n, '<none>') AS seg_or_default,
                     seg_n = 'MACHINERY' AS eq_3vl,
                     seg_n IS NOT DISTINCT FROM 'MACHINERY' AS eq_nullsafe,
                     seg_n IS NOT DISTINCT FROM NULL AS is_null_nullsafe
              FROM n ORDER BY c_custkey"""),
      doc = "NULL semantics side by side: NULLIF-manufactured nulls through COALESCE, " +
        "three-valued equality (null result), and null-safe <=> / IS NOT DISTINCT FROM"),

    // Corrupt-record ingestion path — real feeds carry malformed JSON, and
    // at 100 TB the engine must quarantine-and-continue, never abort the
    // job (PERMISSIVE semantics) and never silently drop. Rows are
    // deterministically mangled in-query (leading garbage on
    // event_id % 97 == 0 — Jackson tolerates TRAILING tokens, so the
    // mangle must break the first token) so the oracle corrupts the SAME
    // rows; the
    // census proves corrupt rows are counted, excluded from the parsed
    // sum, and everything else parses. `parsed.k` is the corruption
    // signal (a valid row always carries k), robust to whether from_json
    // nulls the struct or its fields.
    GQuery("o16_bad_records",
      (s, dir) => Tables.events(s, dir)
        .withColumn("raw",
          when(col("event_id") % 97 === 0, concat(lit("{"), col("props")))
            .otherwise(col("props")))
        .withColumn("parsed", from_json(col("raw"), {
          import org.apache.spark.sql.types._
          StructType(Seq(StructField("k", IntegerType)))
        }))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(col("parsed.k")).as("n_parsed"),
          (count(lit(1)) - count(col("parsed.k"))).as("n_corrupt"),
          sum(coalesce(col("parsed.k"), lit(0))).as("sum_k"))
        .orderBy(col("event_type")),
      Some("""WITH r AS (
                SELECT event_type,
                       CASE WHEN event_id % 97 = 0 THEN '{' || props ELSE props END AS raw
                FROM events)
              SELECT event_type, count(*) AS n,
                     count(CASE WHEN json_valid(raw) THEN 1 END) AS n_parsed,
                     CAST(count(*) - count(CASE WHEN json_valid(raw) THEN 1 END) AS BIGINT) AS n_corrupt,
                     CAST(SUM(CASE WHEN json_valid(raw)
                              THEN CAST(json_extract_string(raw, '$.k') AS INT)
                              ELSE 0 END) AS BIGINT) AS sum_k
              FROM r GROUP BY event_type ORDER BY event_type"""),
      doc = "PERMISSIVE corrupt-JSON ingestion: malformed rows counted and excluded " +
        "from parsed aggregates, job never aborts, nothing silently dropped"),

    // ---- observe(): pipeline metrics collected in the SAME pass as the
    // query via the listener bus — at 100 TB the difference between "know
    // your row counts" and "run the 100 TB scan twice". The per-flag
    // census is the query's own output; the ALL row is built ONLY from
    // the Observation's listener-delivered map (never re-aggregated), so
    // the oracle match proves the metrics path end-to-end.
    GQuery("o19_observed_metrics",
      (s, dir) => {
        val obs = org.apache.spark.sql.Observation(
          "graft_o19_" + seq.incrementAndGet())
        val grouped = Tables.lineitem(s, dir)
          .observe(obs,
            count(lit(1)).as("n_items"),
            count(when(col("l_returnflag") === "R", 1)).as("n_returned"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            count(when(col("l_returnflag") === "R", 1)).as("n_returned"))
          .collect()  // the one action: populates the observation as it runs
        val m = obs.get
        val rows = grouped.map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSeq :+
          (("ALL", m("n_items").asInstanceOf[Long],
            m("n_returned").asInstanceOf[Long]))
        import s.implicits._
        rows.toDF("l_returnflag", "n_items", "n_returned")
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n_items,
                     count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned
              FROM lineitem GROUP BY l_returnflag
              UNION ALL
              SELECT 'ALL', count(*),
                     count(CASE WHEN l_returnflag = 'R' THEN 1 END)
              FROM lineitem
              ORDER BY l_returnflag"""),
      doc = "observe() in-pass metrics: global counts delivered on the listener " +
        "bus during the census scan (no second job); ALL row from the " +
        "Observation map only"),

    // ---- Spark 4 collations: UNICODE_CI comparison/distinct semantics on
    // a mixed-case column, censused as integers (never emitting a collated
    // group representative, whose rendering is engine-private). The oracle
    // lower()s instead — equivalent for the ASCII corpus, which is exactly
    // the claim being checked.
    GQuery("o23_collation",
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_mktsegment").as("seg"),
          when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
            .otherwise(col("c_mktsegment")).as("mixed"))
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("mixed") === col("seg"), 1)).as("n_eq_binary"),
          count(when(expr("collate(mixed, 'UNICODE_CI') = collate(seg, 'UNICODE_CI')"), 1))
            .as("n_eq_ci"),
          countDistinct(col("mixed")).as("n_distinct_binary"),
          countDistinct(expr("collate(mixed, 'UNICODE_CI')")).as("n_distinct_ci")),
      Some("""WITH t AS (
                SELECT c_mktsegment AS seg,
                       CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                            ELSE c_mktsegment END AS mixed
                FROM customer)
              SELECT count(*) AS n_rows,
                     count(CASE WHEN mixed = seg THEN 1 END) AS n_eq_binary,
                     count(CASE WHEN lower(mixed) = lower(seg) THEN 1 END) AS n_eq_ci,
                     count(DISTINCT mixed) AS n_distinct_binary,
                     count(DISTINCT lower(mixed)) AS n_distinct_ci
              FROM t"""),
      doc = "UNICODE_CI collation: case-insensitive equality and DISTINCT == " +
        "lower() oracle on the ASCII corpus; binary counts differ, CI counts halve"),

    // ---- try_* error-safe arithmetic: the ANSI-adjacent surface a
    // pipeline uses where a single malformed row must become NULL, not a
    // job abort — division by zero, bigint overflow, unparseable cast.
    // The oracle re-derives each NULL with explicit CASE guards, so the
    // null-production rules must agree exactly.
    GQuery("o22_try_arith",
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"),
          expr("try_divide(CAST(floor(o_totalprice * 100) AS BIGINT), o_orderkey % 7)")
            .as("per_bucket"),
          expr("try_add(9223372036854775807L, o_orderkey % 3)").as("max_plus"),
          expr("try_cast(CASE WHEN o_orderkey % 5 = 0 THEN 'x' " +
            "ELSE CAST(o_orderkey AS STRING) END AS BIGINT)").as("parsed"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
                     CASE WHEN o_orderkey % 7 = 0 THEN NULL
                          ELSE CAST(floor(o_totalprice * 100) AS BIGINT)
                               / (o_orderkey % 7) END AS per_bucket,
                     CASE WHEN o_orderkey % 3 = 0
                          THEN 9223372036854775807 ELSE NULL END AS max_plus,
                     TRY_CAST(CASE WHEN o_orderkey % 5 = 0 THEN 'x'
                              ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS parsed
              FROM orders ORDER BY o_orderkey"""),
      doc = "try_divide / try_add / try_cast null-on-error semantics == explicit " +
        "CASE-guard oracle (divide-by-zero, overflow, bad parse)"),

    // ---- MapType surface: per-user event-type histogram built AS A MAP
    // (map_from_entries over sorted entries), then consumed with
    // element_at / map_keys / map_values + a higher-order fold — the
    // collection type the o15 array lambdas don't cover. The oracle
    // checks the VALUES through plain conditional aggregation, so the
    // whole map round-trip must be semantically transparent.
    GQuery("o21_map_ops",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("n"))))).as("m"))
        .select(col("user_id"),
          size(col("m")).as("n_types"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
          coalesce(element_at(col("m"), "view"), lit(0L)).as("n_view"),
          expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("n_events"),
          concat_ws(",", map_keys(col("m"))).as("types_csv"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
                     CAST(count(DISTINCT event_type) AS INT) AS n_types,
                     count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
                     count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
                     count(*) AS n_events,
                     string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv
              FROM events GROUP BY user_id ORDER BY user_id"""),
      doc = "MapType round-trip: map_from_entries histogram consumed via " +
        "element_at/map_keys/map_values/aggregate == plain conditional-agg oracle"),

    // ---- LATERAL correlated subquery with ORDER BY + LIMIT: the per-row
    // dependent top-k join, exercised through the engine's DECORRELATION
    // path (DomainJoin rewrite → ranked join) rather than the explicit
    // window of w1_topn_per_customer — the same declarative ask, a
    // different optimizer surface, and the form ad-hoc SQL users write.
    GQuery("o20_lateral_topk",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("v_cust_lat")
        Tables.orders(s, dir).createOrReplaceTempView("v_ord_lat")
        s.sql("""
          SELECT c.c_custkey, t.o_orderkey, t.cents
          FROM v_cust_lat c,
          LATERAL (SELECT o_orderkey,
                          CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                   FROM v_ord_lat o WHERE o.o_custkey = c.c_custkey
                   ORDER BY cents DESC, o_orderkey LIMIT 2) t
          ORDER BY c.c_custkey, t.cents DESC, t.o_orderkey""")
      },
      Some("""SELECT c.c_custkey, t.o_orderkey, t.cents
              FROM customer c,
              LATERAL (SELECT o_orderkey,
                              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                       FROM orders o WHERE o.o_custkey = c.c_custkey
                       ORDER BY cents DESC, o_orderkey LIMIT 2) t
              ORDER BY c.c_custkey, t.cents DESC, t.o_orderkey"""),
      doc = "LATERAL dependent top-2 per customer through the decorrelation " +
        "rewrite == the same SQL in DuckDB (implicit inner lateral drops " +
        "order-less customers)"),

    // Rolling 7-day distinct actives (WAU) — the engagement metric whose
    // DISTINCT makes it non-decomposable over sliding windows: window
    // sums can reuse partial aggregates (agg_sliding_time_window), window
    // DISTINCTs cannot. The scale shape is the bounded ×7 fan-out of the
    // per-(user, day) DISTINCT set — never a windows×events self-join —
    // then one distinct count per window-start day.
    GQuery("agg_rolling_distinct_users",
      (s, dir) => Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
        .select(col("user_id"), col("day"),
          explode(sequence(lit(0), lit(6))).as("i"))
        .select(col("user_id"), (col("day") - col("i")).as("start_day"))
        .groupBy(col("start_day"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .select(
          date_format(timestamp_seconds(col("start_day") * 86400), "yyyy-MM-dd")
            .as("window_start"),
          col("wau"))
        .orderBy(col("window_start")),
      Some("""WITH d AS (
                SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                FROM events),
              w AS (
                SELECT user_id, day - i.i AS start_day
                FROM d, (SELECT unnest(range(0, 7)) AS i) i)
              SELECT strftime(to_timestamp(start_day * 86400), '%Y-%m-%d') AS window_start,
                     count(DISTINCT user_id) AS wau
              FROM w GROUP BY start_day ORDER BY window_start"""),
      doc = "rolling 7-day distinct active users (WAU): bounded ×7 fan-out of the " +
        "(user, day) distinct set — sliding DISTINCT without a self-join"),

    // Funnel analysis — ordered-event product analytics without a
    // sequence-pattern operator: per-user FIRST-occurrence times of each
    // stage (conditional min — one map-side-combining aggregate), then
    // the reached stage is the longest strictly-increasing prefix of the
    // (view, click, purchase) first-times. Comparing first-occurrence µs
    // longs is engine-exact; ties break the chain identically everywhere.
    GQuery("funnel_stages",
      (s, dir) => {
        def firstOf(t: String) =
          min(when(col("event_type") === t, unix_micros(col("ts")))).as(s"t_$t")
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
          .withColumn("stage",
            when(col("t_view").isNull, 0)
              .when(col("t_click").isNull || col("t_click") <= col("t_view"), 1)
              .when(col("t_purchase").isNull || col("t_purchase") <= col("t_click"), 2)
              .otherwise(3).cast("int"))
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("stage"))
      },
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
      doc = "view→click→purchase funnel census: per-user first-occurrence ordering " +
        "(conditional min), stage = longest strictly-increasing prefix"),

    // Funnel latency — how long conversion takes, not just whether it
    // happens: per fully-converting user (strict view < click < purchase
    // ordering, same chain as funnel_stages) the view→purchase delta in
    // exact µs integers, reduced to count/min/avg/max. The avg is the one
    // double, produced by a single BIGINT-sum / count division (exact in
    // both engines); no percentile machinery, so no global-order window.
    GQuery("funnel_time_to_convert",
      (s, dir) => {
        def firstOf(t: String) =
          min(when(col("event_type") === t, unix_micros(col("ts")))).as(s"t_$t")
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
          .filter(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"))
          .withColumn("delta_us", col("t_purchase") - col("t_view"))
          .agg(count(lit(1)).as("n_converted"),
            min(col("delta_us")).as("min_us"),
            (sum(col("delta_us")).cast("double") / count(lit(1))).as("avg_us"),
            max(col("delta_us")).as("max_us"))
      },
      Some("""WITH f AS (
                SELECT user_id,
                       min(epoch_us(ts)) FILTER (WHERE event_type = 'view') AS t_view,
                       min(epoch_us(ts)) FILTER (WHERE event_type = 'click') AS t_click,
                       min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS t_purchase
                FROM events GROUP BY user_id),
              c AS (
                SELECT t_purchase - t_view AS delta_us FROM f
                WHERE t_view < t_click AND t_click < t_purchase)
              SELECT count(*) AS n_converted,
                     min(delta_us) AS min_us,
                     CAST(SUM(delta_us) AS DOUBLE) / count(*) AS avg_us,
                     max(delta_us) AS max_us
              FROM c"""),
      doc = "funnel latency: exact µs view→purchase deltas for strictly-ordered " +
        "converters, reduced to count/min/avg/max (one exact double division)"),

    // ---- First-order Markov transition matrix over each user's ordered
    // event stream — the behavioral model next to the funnel/cohort pair
    // (what follows what, and with what probability). One user-partitioned
    // lag window + two map-side-combined aggregates; probabilities are ONE
    // exact double division of exact integer counts, so the matrix
    // hash-compares.
    GQuery("markov_transitions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val tr = Tables.events(s, dir)
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type"))
          .agg(count(lit(1)).as("n_transitions"))
        val tot = tr.groupBy(col("prev_type"))
          .agg(sum(col("n_transitions")).as("t"))
        tr.join(tot, Seq("prev_type"))
          .select(col("prev_type"), col("event_type").as("next_type"),
            col("n_transitions"),
            (col("n_transitions").cast("double") / col("t")).as("p"))
          .orderBy(col("prev_type"), col("next_type"))
      },
      Some("""WITH tr AS (
                SELECT lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS prev_type,
                       event_type AS next_type
                FROM events),
              c AS (SELECT prev_type, next_type, count(*) AS n_transitions
                    FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
              t AS (SELECT prev_type, CAST(sum(n_transitions) AS BIGINT) AS t
                    FROM c GROUP BY 1)
              SELECT c.prev_type, c.next_type, c.n_transitions,
                     CAST(c.n_transitions AS DOUBLE) / t.t AS p
              FROM c JOIN t USING (prev_type)
              ORDER BY prev_type, next_type"""),
      doc = "per-user Markov transition matrix: lag window + exact counts, " +
        "row-normalized by one exact double division"),

    // ---- k-anonymity census over the generalization ladder — the
    // governance gate a curation pipeline runs before releasing records
    // keyed by quasi-identifiers: at each generalization level (full QI
    // tuple → drop the finest attribute → fully generalized) count the
    // equivalence classes per class size and the rows living in classes
    // below k=5 (the re-identifiable remainder suppression must handle).
    // Three map-side-combined aggregates over (nation, segment) — at
    // 100 TB the class table is |QI-domain|-bounded, never row-bounded.
    GQuery("privacy_k_anon_census",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        def level(l: Int, qi: Seq[String]) = cust
          .groupBy(qi.map(col): _*).agg(count(lit(1)).as("class_size"))
          .groupBy(col("class_size"))
          .agg(count(lit(1)).as("n_classes"),
            sum(col("class_size")).as("n_rows"))
          .withColumn("level", lit(l))
        level(0, Seq("c_nationkey", "c_mktsegment"))
          .unionByName(level(1, Seq("c_nationkey")))
          .select(col("level"), col("class_size"), col("n_classes"),
            col("n_rows"), (col("class_size") < 5).as("violates_k5"))
          .orderBy(col("level"), col("class_size"))
      },
      Some("""WITH l0 AS (
                SELECT 0 AS level, class_size,
                       CAST(count(*) AS BIGINT) AS n_classes,
                       CAST(sum(class_size) AS BIGINT) AS n_rows
                FROM (SELECT count(*) AS class_size FROM customer
                      GROUP BY c_nationkey, c_mktsegment)
                GROUP BY class_size),
              l1 AS (
                SELECT 1 AS level, class_size,
                       CAST(count(*) AS BIGINT) AS n_classes,
                       CAST(sum(class_size) AS BIGINT) AS n_rows
                FROM (SELECT count(*) AS class_size FROM customer
                      GROUP BY c_nationkey)
                GROUP BY class_size)
              SELECT level, class_size, n_classes, n_rows,
                     class_size < 5 AS violates_k5
              FROM (SELECT * FROM l0 UNION ALL SELECT * FROM l1)
              ORDER BY level, class_size"""),
      doc = "k-anonymity census over the QI generalization ladder: class-size " +
        "histogram per level + k=5 violation flag — the pre-release governance gate"),

    // ---- l-diversity census — k-anonymity's sibling on the SENSITIVE
    // axis: a class can be large (k-safe) yet expose everyone if all its
    // rows share one sensitive value. Per QI class, l = |distinct
    // sensitive buckets| (account-balance thousands); histogram of
    // classes by l with the l=3 violation flag. Two map-side-combined
    // aggregates over the |QI-domain|-bounded class table.
    GQuery("privacy_l_diversity",
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("sens"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("class_size"),
          countDistinct(col("sens")).as("l"))
        .groupBy(col("l"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("class_size")).as("n_rows"))
        .select(col("l"), col("n_classes"), col("n_rows"),
          (col("l") < 3).as("violates_l3"))
        .orderBy(col("l")),
      Some("""WITH cls AS (
                SELECT c_nationkey, c_mktsegment,
                       count(*) AS class_size,
                       count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l
                FROM customer GROUP BY 1, 2)
              SELECT l, count(*) AS n_classes,
                     CAST(SUM(class_size) AS BIGINT) AS n_rows,
                     l < 3 AS violates_l3
              FROM cls GROUP BY l ORDER BY l"""),
      doc = "l-diversity census: distinct-sensitive-value count per QI class, " +
        "class histogram by l + l=3 violation flag — the sensitive-axis " +
        "sibling of the k-anonymity gate"),

    // ---- t-closeness census (Li et al. 2007) — the third rung of the
    // privacy ladder: a class can be k-large and l-diverse yet still leak
    // if its sensitive DISTRIBUTION diverges from the table's. For the
    // ordered sensitive attribute (acctbal bands 0..4), t = EMD =
    // (1/(m−1))·Σᵢ|CumP(i) − CumQ(i)| — kept exact by cross-multiplying:
    // Σ|cg·N − cq·n_g| over the first m−1 cumulative points, scaled
    // through DECIMAL so the 1e4 step never overflows at table scale.
    // Cumulatives come from a 5-row band-literal join (no unpartitioned
    // window); every aggregate is bounded by |segments|×|bands|.
    GQuery("privacy_t_closeness",
      (s, dir) => {
        val bandExpr =
          "greatest(0L, least(4L, (CAST(c_acctbal * 100 AS BIGINT) + 99999) div 220000))"
        val cust = Tables.customer(s, dir)
          .select(col("c_mktsegment"), expr(bandExpr).as("band"))
        val bands = s.range(0, 5).select(col("id").as("i"))
        val tot = cust.agg(count(lit(1)).as("n_total"))
        // contract to ≤|bands| / ≤|segments×bands| rows BEFORE the non-equi
        // cumulative join: both join sides stay literal-bounded (a raw
        // band<=i join against the corpus would BNLJ-broadcast the corpus)
        val glob = cust.groupBy(col("band")).agg(count(lit(1)).as("q"))
        val globCum = bands.join(broadcast(glob), col("band") <= col("i"), "left")
          .groupBy(col("i")).agg(coalesce(sum(col("q")), lit(0L)).as("cq"))
        val grpN = cust.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_group"))
        val grpCum = cust.groupBy(col("c_mktsegment"), col("band"))
          .agg(count(lit(1)).as("g"))
          .join(broadcast(bands), col("band") <= col("i"))
          .groupBy(col("c_mktsegment"), col("i")).agg(sum(col("g")).as("cg"))
        grpN.crossJoin(broadcast(bands.filter(col("i") <= 3)))
          .join(grpCum, Seq("c_mktsegment", "i"), "left")
          .withColumn("cg", coalesce(col("cg"), lit(0L)))
          .join(broadcast(globCum), Seq("i"))
          .crossJoin(broadcast(tot))
          .groupBy(col("c_mktsegment"), col("n_group"), col("n_total"))
          .agg(sum(abs(col("cg") * col("n_total") - col("cq") * col("n_group")))
            .as("t_scaled"))
          .select(col("c_mktsegment"), col("n_group"), col("t_scaled"),
            expr("""CAST(CAST(10000 AS DECIMAL(38,0)) * CAST(t_scaled AS DECIMAL(38,0))
                    div (CAST(n_group AS DECIMAL(38,0)) * CAST(n_total AS DECIMAL(38,0))
                         * 4) AS BIGINT)""").as("t_e4"))
          .withColumn("violates_t02", col("t_e4") > 2000)
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH c AS (
              |  SELECT c_mktsegment,
              |         greatest(0, least(4, (CAST(c_acctbal * 100 AS BIGINT) + 99999)
              |                              // 220000)) AS band
              |  FROM customer),
              |bands AS (SELECT unnest(range(0, 5)) AS i),
              |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM c),
              |gc AS (SELECT b.i, CAST(count(c.band) AS BIGINT) AS cq
              |       FROM bands b LEFT JOIN c ON c.band <= b.i GROUP BY b.i),
              |gn AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_group
              |       FROM c GROUP BY 1),
              |gg AS (SELECT c_mktsegment, b.i, CAST(count(*) AS BIGINT) AS cg
              |       FROM c JOIN bands b ON c.band <= b.i GROUP BY 1, 2),
              |j AS (SELECT n.c_mktsegment, n.n_group, b.i,
              |             COALESCE(g.cg, 0) AS cg, q.cq, t.n_total
              |      FROM gn n CROSS JOIN bands b
              |      LEFT JOIN gg g ON g.c_mktsegment = n.c_mktsegment AND g.i = b.i
              |      JOIN gc q ON q.i = b.i, tot t
              |      WHERE b.i <= 3)
              |SELECT c_mktsegment, n_group,
              |       CAST(SUM(abs(cg * n_total - cq * n_group)) AS BIGINT) AS t_scaled,
              |       CAST(CAST(10000 AS HUGEINT)
              |              * CAST(SUM(abs(cg * n_total - cq * n_group)) AS HUGEINT)
              |            // (CAST(n_group AS HUGEINT) * CAST(n_total AS HUGEINT) * 4)
              |            AS BIGINT) AS t_e4,
              |       CAST(CAST(10000 AS HUGEINT)
              |              * CAST(SUM(abs(cg * n_total - cq * n_group)) AS HUGEINT)
              |            // (CAST(n_group AS HUGEINT) * CAST(n_total AS HUGEINT) * 4)
              |            AS BIGINT) > 2000 AS violates_t02
              |FROM j GROUP BY 1, 2, n_total ORDER BY c_mktsegment""".stripMargin),
      doc = "t-closeness census: exact cross-multiplied EMD between each QI " +
        "class's ordered sensitive-band distribution and the global one, " +
        "1e4-scaled + t=0.2 violation flag — completes the " +
        "k-anonymity / l-diversity / t-closeness governance ladder"),

    // ---- Shuffle-key skew census — the diagnostic a join/agg planner
    // consults BEFORE picking salting (join_skew_salted) or AQE skew
    // handling. Order statistics come from the VALUE-DOMAIN histogram of
    // per-key counts (|distinct count values| rows — bounded however many
    // keys exist), not a rank window over the corpus-scale key table: the
    // exact p50/p99 is the smallest count value whose cumulative key tally
    // reaches the rank (the agg_percentiles_hist convention, and the shape
    // the unpartitioned-window plan guard admits). The heaviest key is one
    // lexicographic struct-max over the key table — an aggregate, not a
    // window.
    GQuery("agg_key_skew",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val counts = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
        val top = counts.agg(
          count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          max(struct(col("c"), col("l_orderkey"))).as("mx"))
          .select(col("n_keys"), col("n_rows"),
            col("mx.c").as("max_rows"), col("mx.l_orderkey").as("top_key"))
        val hist = counts.groupBy(col("c")).agg(count(lit(1)).as("nk"))
        val wC = Window.orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = hist.withColumn("cum", sum(col("nk")).over(wC))
        def pick(alias: String, rankSql: String) = cum.crossJoin(top)
          .filter(expr(s"cum >= $rankSql"))
          .agg(min(col("c")).as(alias))
        top.crossJoin(pick("p50_rows", "CAST(ceil(n_keys / 2.0) AS BIGINT)"))
          .crossJoin(pick("p99_rows", "CAST(ceil(n_keys * 99 / 100.0) AS BIGINT)"))
          .select(col("n_keys"), col("n_rows"), col("max_rows"),
            col("p50_rows"), col("p99_rows"), col("top_key"),
            (col("max_rows").cast("double") / col("p50_rows")).as("skew_ratio"))
      },
      Some("""WITH c AS (SELECT l_orderkey, count(*) AS c
                         FROM lineitem GROUP BY l_orderkey),
              s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                           CAST(sum(c) AS BIGINT) AS n_rows,
                           CAST(max({'c': c, 'k': l_orderkey}).c AS BIGINT) AS max_rows,
                           max({'c': c, 'k': l_orderkey}).k AS top_key
                    FROM c),
              h AS (SELECT c, count(*) AS nk FROM c GROUP BY c),
              cum AS (SELECT c, sum(nk) OVER (ORDER BY c
                               ROWS UNBOUNDED PRECEDING) AS cum FROM h),
              p50 AS (SELECT min(c) AS p50_rows FROM cum, s
                      WHERE cum >= CAST(ceil(s.n_keys / 2.0) AS BIGINT)),
              p99 AS (SELECT min(c) AS p99_rows FROM cum, s
                      WHERE cum >= CAST(ceil(s.n_keys * 99 / 100.0) AS BIGINT))
              SELECT s.n_keys, s.n_rows, s.max_rows, p50.p50_rows, p99.p99_rows,
                     s.top_key,
                     CAST(s.max_rows AS DOUBLE) / p50.p50_rows AS skew_ratio
              FROM s, p50, p99"""),
      doc = "shuffle-key skew census: exact p50/p99/max of per-key row counts " +
        "from the bounded count-value histogram + lexicographic struct-max " +
        "heaviest key — the salting/AQE decision input"),

    // ---- Join-cardinality explosion census — the OTHER planner input
    // next to agg_key_skew: the exact output size of a planned self-equi-
    // join (Σ_k n_k²) and the keys that dominate it. One map-side-combined
    // count per key, one scalar total, top-10 via TakeOrderedAndProject —
    // no window, no second corpus pass. The per-10k contribution column is
    // the "this one key is 30% of your join output" signal that decides
    // salting/filtering BEFORE the 100-TB shuffle is launched.
    GQuery("join_cardinality_census",
      (s, dir) => {
        val counts = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
          .withColumn("pairs", col("c") * col("c"))
        val tot = counts.agg(sum(col("pairs")).as("total_pairs"),
          count(lit(1)).as("n_keys"))
        counts.crossJoin(broadcast(tot))
          .select(col("l_partkey"), col("c").as("n_rows"), col("pairs"),
            expr("pairs * 10000 div total_pairs").as("pairs_per_10k"),
            col("total_pairs"), col("n_keys"))
          .orderBy(col("pairs").desc, col("l_partkey"))
          .limit(10)
      },
      Some("""WITH k AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
                         FROM lineitem GROUP BY l_partkey),
              t AS (SELECT CAST(SUM(c * c) AS BIGINT) AS total_pairs,
                           CAST(count(*) AS BIGINT) AS n_keys FROM k)
              SELECT k.l_partkey, k.c AS n_rows, k.c * k.c AS pairs,
                     k.c * k.c * 10000 // t.total_pairs AS pairs_per_10k,
                     t.total_pairs, t.n_keys
              FROM k, t ORDER BY pairs DESC, l_partkey LIMIT 10"""),
      doc = "join-cardinality explosion census: exact self-join output size " +
        "per key (n_k^2) + total + top-10 dominating keys, no window/second pass"),

    // ---- Last-touch marketing attribution: each purchase's cents go to
    // the user's most recent click/view inside a 3-day lookback, else
    // 'direct'. Deliberately NOT the ASOF-join shape: equal-timestamp
    // touches make ASOF nondeterministic in both engines, so the touch is
    // a lexicographic struct-argmax (ts, then channel) over a BANDED
    // interval join — per-purchase fan-out bounded by the user's 3-day
    // touch count (the unbounded-lookback alternative is ops/AsOfJoin's
    // union+window form). One user-keyed shuffle; cents exact.
    GQuery("attr_last_touch",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts").as("p_ts"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
        val t = ev.filter(col("event_type").isin("click", "view"))
          .select(col("user_id").as("t_user"), col("ts").as("t_ts"),
            col("event_type").as("ch"))
        p.join(t, col("t_user") === col("user_id") &&
            col("t_ts") <= col("p_ts") &&
            expr("unix_micros(p_ts) - unix_micros(t_ts) <= 3 * 86400000000"),
            "left")
          .groupBy(col("event_id"), col("cents"))
          .agg(max(when(col("t_ts").isNotNull,
            struct(col("t_ts"), col("ch")))).as("touch"))
          .select(col("cents"),
            coalesce(col("touch.ch"), lit("direct")).as("channel"))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("cents")).as("attributed_cents"))
          .orderBy(col("channel"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts AS p_ts,
                                CAST(floor(value * 100) AS BIGINT) AS cents
                         FROM events WHERE event_type = 'purchase'),
              t AS (SELECT user_id AS t_user, ts AS t_ts, event_type AS ch
                    FROM events WHERE event_type IN ('click', 'view')),
              lt AS (
                SELECT p.event_id, p.cents,
                       max(CASE WHEN t.t_ts IS NOT NULL
                                THEN {'t': t.t_ts, 'ch': t.ch} END) AS touch
                FROM p LEFT JOIN t ON t.t_user = p.user_id AND t.t_ts <= p.p_ts
                     AND epoch_us(p.p_ts) - epoch_us(t.t_ts) <= 3 * 86400000000
                GROUP BY p.event_id, p.cents)
              SELECT COALESCE(touch.ch, 'direct') AS channel,
                     count(*) AS n_purchases,
                     CAST(SUM(cents) AS BIGINT) AS attributed_cents
              FROM lt GROUP BY 1 ORDER BY 1"""),
      doc = "last-touch attribution: purchase cents to the latest click/view " +
        "in a 3-day lookback via deterministic struct-argmax (ASOF ties are " +
        "nondeterministic), 'direct' fallback; per-channel exact report"),

    // ---- Table-level expectation suite (the dbt-tests / Great-
    // Expectations deliverable; row-level constraint quarantine is S7):
    // uniqueness, two referential-integrity checks, not-null, accepted
    // range, event freshness, minimum row count — each ONE aggregate or
    // anti-join over its table, unioned into a single pass/fail report.
    // At 100 TB each check is an independent scan-shaped job; none holds
    // state beyond a count, and the anti-joins broadcast the key side
    // when small or shuffle on the FK otherwise — planner's choice.
    GQuery("audit_expectations",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val li = Tables.lineitem(s, dir)
        val cust = Tables.customer(s, dir)
        val ev = Tables.events(s, dir)
        def named(name: String, df: org.apache.spark.sql.DataFrame) =
          df.select(lit(name).as("check_name"),
            col("n_violations").cast("long").as("n_violations"))
        named("fk_lineitem_orders",
            li.join(orders.select(col("o_orderkey")),
                col("l_orderkey") === col("o_orderkey"), "left_anti")
              .agg(count(lit(1)).as("n_violations")))
          .unionByName(named("fk_orders_customer",
            orders.join(cust.select(col("c_custkey")),
                col("o_custkey") === col("c_custkey"), "left_anti")
              .agg(count(lit(1)).as("n_violations"))))
          .unionByName(named("freshness_events_jan2024",
            ev.agg(count(when(col("ts") < lit("2024-01-01").cast("timestamp") ||
                col("ts") >= lit("2024-02-01").cast("timestamp"), lit(1)))
              .as("n_violations"))))
          .unionByName(named("not_null_o_orderdate",
            orders.agg(count(when(col("o_orderdate").isNull, lit(1)))
              .as("n_violations"))))
          .unionByName(named("range_l_quantity_1_50",
            li.agg(count(when(col("l_quantity") < 1 || col("l_quantity") > 50,
              lit(1))).as("n_violations"))))
          .unionByName(named("rowcount_lineitem_min1000",
            li.agg(when(count(lit(1)) >= 1000, lit(0L)).otherwise(lit(1L))
              .as("n_violations"))))
          .unionByName(named("unique_o_orderkey",
            orders.agg((count(lit(1)) - countDistinct(col("o_orderkey")))
              .as("n_violations"))))
          .withColumn("pass", col("n_violations") === 0)
          .orderBy(col("check_name"))
      },
      Some("""WITH checks AS (
                SELECT 'fk_lineitem_orders' AS check_name,
                       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
                UNION ALL SELECT 'fk_orders_customer',
                       (SELECT count(*) FROM orders o WHERE NOT EXISTS
                          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
                UNION ALL SELECT 'freshness_events_jan2024',
                       (SELECT count(*) FROM events
                        WHERE ts < TIMESTAMP '2024-01-01' OR ts >= TIMESTAMP '2024-02-01')
                UNION ALL SELECT 'not_null_o_orderdate',
                       (SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
                UNION ALL SELECT 'range_l_quantity_1_50',
                       (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
                UNION ALL SELECT 'rowcount_lineitem_min1000',
                       (SELECT CASE WHEN count(*) >= 1000 THEN 0 ELSE 1 END FROM lineitem)
                UNION ALL SELECT 'unique_o_orderkey',
                       (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders))
              SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
                     n_violations = 0 AS pass
              FROM checks ORDER BY check_name"""),
      doc = "table-level expectation suite: uniqueness, referential integrity, " +
        "not-null, range, freshness, min row count — one pass/fail report"),

    // ---- Merkle-style anti-entropy diff: is replica == primary, WITHOUT
    // comparing every row across the wire? Level 1: per-bucket digests
    // (bit_xor of row hashes — order-independent, overflow-free — plus a
    // row count for xor-cancellation blindness) from ONE scan per side;
    // level 2: the row-level full-outer compare runs ONLY inside
    // mismatched buckets (left_semi prune). At 100 TB with drift confined
    // to few buckets, level 2 touches a vanishing fraction of the data —
    // the Cassandra/DynamoDB repair shape as a declarative plan. The
    // replica is the primary with injected drift (1 changed + 1 deleted
    // key per 1000) so the diff surface is deterministic.
    GQuery("audit_merkle_diff",
      (s, dir) => {
        val base = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"),
            floor(col("o_totalprice") * 100).cast("long").as("cents"))
        val replica = base.filter(col("o_orderkey") % 1000 =!= 13)
          .withColumn("cents", when(col("o_orderkey") % 1000 === 7,
            col("cents") + 1).otherwise(col("cents")))
        def hashed(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("rh", expr(
            "CAST(conv(substring(md5(concat_ws('|', o_orderkey, o_orderstatus, cents)), 1, 15), 16, 10) AS BIGINT)"))
          .withColumn("bucket", expr("o_orderkey div 100"))
        val pb = hashed(base).groupBy(col("bucket"))
          .agg(expr("bit_xor(rh)").as("p_dig"), count(lit(1)).as("p_n"))
        val rb = hashed(replica).groupBy(col("bucket"))
          .agg(expr("bit_xor(rh)").as("r_dig"), count(lit(1)).as("r_n"))
        val bad = pb.join(rb, Seq("bucket"), "full_outer")
          .filter(not(col("p_dig") <=> col("r_dig")) || not(col("p_n") <=> col("r_n")))
          .select(col("bucket"))
        val pd = hashed(base).join(bad, Seq("bucket"), "left_semi")
          .select(col("o_orderkey"), col("rh").as("p_rh"))
        val rd = hashed(replica).join(bad, Seq("bucket"), "left_semi")
          .select(col("o_orderkey"), col("rh").as("r_rh"))
        pd.join(rd, Seq("o_orderkey"), "full_outer")
          .withColumn("diff_type", when(col("r_rh").isNull, "missing_replica")
            .when(col("p_rh").isNull, "missing_primary")
            .when(col("p_rh") =!= col("r_rh"), "changed"))
          .filter(col("diff_type").isNotNull)
          .select(col("o_orderkey"), col("diff_type"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH base AS (
                SELECT o_orderkey, o_orderstatus,
                       CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                FROM orders),
              replica AS (
                SELECT o_orderkey, o_orderstatus,
                       CASE WHEN o_orderkey % 1000 = 7 THEN cents + 1
                            ELSE cents END AS cents
                FROM base WHERE o_orderkey % 1000 <> 13),
              ph AS (SELECT *,
                       CAST('0x' || substr(md5(o_orderkey || '|' || o_orderstatus || '|' || cents), 1, 15) AS BIGINT) AS rh,
                       o_orderkey // 100 AS bucket FROM base),
              rh AS (SELECT *,
                       CAST('0x' || substr(md5(o_orderkey || '|' || o_orderstatus || '|' || cents), 1, 15) AS BIGINT) AS rh,
                       o_orderkey // 100 AS bucket FROM replica),
              pb AS (SELECT bucket, bit_xor(rh) AS p_dig, count(*) AS p_n FROM ph GROUP BY bucket),
              rb AS (SELECT bucket, bit_xor(rh) AS r_dig, count(*) AS r_n FROM rh GROUP BY bucket),
              bad AS (
                SELECT COALESCE(pb.bucket, rb.bucket) AS bucket
                FROM pb FULL OUTER JOIN rb ON pb.bucket = rb.bucket
                WHERE pb.p_dig IS DISTINCT FROM rb.r_dig
                   OR pb.p_n IS DISTINCT FROM rb.r_n),
              pd AS (SELECT o_orderkey, rh AS p_rh FROM ph
                     WHERE bucket IN (SELECT bucket FROM bad)),
              rd AS (SELECT o_orderkey, rh AS r_rh FROM rh
                     WHERE bucket IN (SELECT bucket FROM bad))
              SELECT COALESCE(pd.o_orderkey, rd.o_orderkey) AS o_orderkey,
                     CASE WHEN rd.r_rh IS NULL THEN 'missing_replica'
                          WHEN pd.p_rh IS NULL THEN 'missing_primary'
                          WHEN pd.p_rh <> rd.r_rh THEN 'changed' END AS diff_type
              FROM pd FULL OUTER JOIN rd ON pd.o_orderkey = rd.o_orderkey
              WHERE (CASE WHEN rd.r_rh IS NULL THEN 'missing_replica'
                          WHEN pd.p_rh IS NULL THEN 'missing_primary'
                          WHEN pd.p_rh <> rd.r_rh THEN 'changed' END) IS NOT NULL
              ORDER BY o_orderkey"""),
      doc = "Merkle-style anti-entropy diff: order-independent bit_xor bucket " +
        "digests + counts, row-level compare only inside mismatched buckets"),

    // ---- Mann-Whitney U (Wilcoxon rank-sum) A/B comparison — the
    // nonparametric experiment readout. Ranks come from the VALUE-DOMAIN
    // cents histogram (the agg_key_skew / prep_range_shards convention),
    // never a rank window over raw rows: ties collapse to one histogram
    // row whose doubled average rank 2·cum + n + 1 is INTEGER-exact (the
    // ×2 absorbs the .5 of averaged tied ranks), so U×2 = 2R − n(n+1) is
    // exact on both engines. The only window is a cumulative sum over the
    // bounded histogram (adjudicated in PlanAuditSpec).
    GQuery("ab_mann_whitney",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .select((col("user_id") % 2).cast("int").as("variant"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
        val hist = ev.groupBy(col("cents")).agg(
          count(when(col("variant") === 0, lit(1))).as("n0"),
          count(when(col("variant") === 1, lit(1))).as("n1"))
        val w = Window.orderBy(col("cents"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranked = hist
          .withColumn("cum", coalesce(sum(col("n0") + col("n1")).over(w), lit(0L)))
          .withColumn("ar2", lit(2L) * col("cum") + col("n0") + col("n1") + 1)
        val sums = ranked.agg(
          sum(col("n0")).as("na"), sum(col("n1")).as("nb"),
          sum(col("n0") * col("ar2")).as("r2a"),
          sum(col("n1") * col("ar2")).as("r2b"),
          sum(col("n0") * col("cents")).as("ca"),
          sum(col("n1") * col("cents")).as("cb"))
        sums.select(lit(0).as("variant"), col("na").as("n"),
            (col("ca").cast("double") / col("na")).as("mean_cents"),
            col("r2a").as("r2_sum"),
            (col("r2a") - col("na") * (col("na") + 1)).as("u2"))
          .unionByName(sums.select(lit(1).as("variant"), col("nb").as("n"),
            (col("cb").cast("double") / col("nb")).as("mean_cents"),
            col("r2b").as("r2_sum"),
            (col("r2b") - col("nb") * (col("nb") + 1)).as("u2")))
          .orderBy(col("variant"))
      },
      Some("""WITH ev AS (
                SELECT CAST(user_id % 2 AS INT) AS variant,
                       CAST(floor(value * 100) AS BIGINT) AS cents
                FROM events),
              hist AS (
                SELECT cents,
                       CAST(count(*) FILTER (variant = 0) AS BIGINT) AS n0,
                       CAST(count(*) FILTER (variant = 1) AS BIGINT) AS n1
                FROM ev GROUP BY cents),
              ranked AS (
                SELECT cents, n0, n1,
                       COALESCE(CAST(SUM(n0 + n1) OVER (ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
                FROM hist),
              ar AS (SELECT *, 2 * cum + n0 + n1 + 1 AS ar2 FROM ranked),
              sums AS (
                SELECT CAST(SUM(n0) AS BIGINT) AS na, CAST(SUM(n1) AS BIGINT) AS nb,
                       CAST(SUM(n0 * ar2) AS BIGINT) AS r2a,
                       CAST(SUM(n1 * ar2) AS BIGINT) AS r2b,
                       CAST(SUM(n0 * cents) AS BIGINT) AS ca,
                       CAST(SUM(n1 * cents) AS BIGINT) AS cb
                FROM ar)
              SELECT 0 AS variant, na AS n, CAST(ca AS DOUBLE) / na AS mean_cents,
                     r2a AS r2_sum, r2a - na * (na + 1) AS u2 FROM sums
              UNION ALL
              SELECT 1, nb, CAST(cb AS DOUBLE) / nb, r2b, r2b - nb * (nb + 1) FROM sums
              ORDER BY variant"""),
      doc = "Mann-Whitney U A/B readout: integer-exact doubled tied ranks from " +
        "the value-domain histogram (no raw-row rank window), U2 = 2R - n(n+1)"),

    // ---- Kaplan-Meier survival (user churn with right-censoring): users
    // still active on the corpus' last day are CENSORED, not churned —
    // the estimator cohort_retention can't give. Observation time is
    // last − first activity day; everything reduces to the ≤31-row
    // lifetime-day table, at-risk counts come from one cumulative window
    // over it, and S(t) = Π(1 − d/n) is a left fold over the collected
    // prefix (aggregate HOF == list_reduce with prepended init — the
    // ts_ewma exact-fold-parity trick), so the doubles are bit-identical.
    GQuery("cohort_survival_km",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
        val maxd = ev.agg(max(col("d")).as("endd"))
        val users = ev.groupBy(col("user_id"))
          .agg(min(col("d")).as("fd"), max(col("d")).as("ld"))
          .crossJoin(broadcast(maxd))
          .select((col("ld") - col("fd")).as("t_obs"),
            (col("ld") === col("endd")).as("censored"))
        val byT = users.groupBy(col("t_obs").as("t")).agg(
          count(lit(1)).as("n_ending"),
          count(when(not(col("censored")), lit(1))).as("n_deaths"),
          count(when(col("censored"), lit(1))).as("n_censored"))
        val tot = users.agg(count(lit(1)).as("n_users"))
        val wPrev = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byT.crossJoin(broadcast(tot))
          .withColumn("n_risk",
            col("n_users") - coalesce(sum(col("n_ending")).over(wPrev), lit(0L)))
          .withColumn("factor",
            lit(1.0) - col("n_deaths").cast("double") / col("n_risk"))
          .withColumn("factors", collect_list(col("factor")).over(wAll))
          .withColumn("survival",
            expr("aggregate(factors, CAST(1.0 AS DOUBLE), (s, x) -> s * x)"))
          .select(col("t"), col("n_risk"), col("n_deaths"),
            col("n_censored"), col("survival"))
          .orderBy(col("t"))
      },
      Some("""WITH ev AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
              mx AS (SELECT max(d) AS endd FROM ev),
              users AS (
                SELECT max(d) - min(d) AS t_obs, max(d) = mx.endd AS censored
                FROM ev, mx GROUP BY user_id, mx.endd),
              byt AS (
                SELECT t_obs AS t, count(*) AS n_ending,
                       CAST(count(*) FILTER (NOT censored) AS BIGINT) AS n_deaths,
                       CAST(count(*) FILTER (censored) AS BIGINT) AS n_censored
                FROM users GROUP BY t_obs),
              tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM users),
              risk AS (
                SELECT t, n_deaths, n_censored,
                       t2.n_users - COALESCE(CAST(SUM(n_ending) OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
                FROM byt, tot t2),
              fx AS (SELECT *,
                       CAST(1.0 AS DOUBLE) - CAST(n_deaths AS DOUBLE) / n_risk AS factor
                     FROM risk),
              fl AS (SELECT *, list(factor) OVER (ORDER BY t
                       ROWS UNBOUNDED PRECEDING) AS factors FROM fx)
              SELECT t, n_risk, n_deaths, n_censored,
                     list_reduce(list_prepend(CAST(1.0 AS DOUBLE), factors),
                       (s, x) -> s * x) AS survival
              FROM fl ORDER BY t"""),
      doc = "Kaplan-Meier churn survival with right-censoring at corpus end: " +
        "lifetime-day table (<=31 rows), cumulative at-risk window, exact " +
        "left-fold product parity for S(t)"),

    // ---- Lead-lag cross-correlation between the click and purchase
    // daily-cents series: Pearson r at lags −3..+3 (does click activity
    // LEAD purchases?). Lags come from a broadcast 7-row literal table
    // joined on shifted day index — no window, no per-lag rescan (the
    // daily series is built once); moments are exact decimals with the
    // agg_pearson_exact IEEE finishing sequence. Pairs exist only where
    // both shifted days do, so each lag's n is part of the output.
    GQuery("ts_cross_correlation",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
        val a = daily.filter(col("event_type") === "click")
          .select(col("d"), col("cents").cast("decimal(18,0)").as("x"))
        val b = daily.filter(col("event_type") === "purchase")
          .select(col("d").as("db"), col("cents").cast("decimal(18,0)").as("y"))
        val lags = a.sparkSession.range(-3, 4)
          .select(col("id").cast("long").as("lag"))
        a.crossJoin(broadcast(lags))
          .join(b, col("db") === col("d") + col("lag"))
          .groupBy(col("lag"))
          .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("lag"), col("n").cast("long").as("n_pairs"),
            expr("CAST(n * sxy - sx * sy AS DOUBLE) " +
              "/ (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) " +
              "* sqrt(CAST(n * syy - sy * sy AS DOUBLE)))").as("xcorr_r"))
          .orderBy(col("lag"))
      },
      Some("""WITH daily AS (
                SELECT event_type, epoch_us(ts) // 86400000000 AS d,
                       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS HUGEINT) AS cents
                FROM events WHERE event_type IN ('click', 'purchase')
                GROUP BY 1, 2),
              a AS (SELECT d, cents AS x FROM daily WHERE event_type = 'click'),
              b AS (SELECT d AS db, cents AS y FROM daily WHERE event_type = 'purchase'),
              lags AS (SELECT unnest(range(-3, 4)) AS lag),
              m AS (
                SELECT l.lag, CAST(count(*) AS HUGEINT) AS n,
                       SUM(a.x) AS sx, SUM(b.y) AS sy, SUM(a.x * b.y) AS sxy,
                       SUM(a.x * a.x) AS sxx, SUM(b.y * b.y) AS syy
                FROM a, lags l JOIN b ON b.db = a.d + l.lag
                GROUP BY l.lag)
              SELECT lag, CAST(n AS BIGINT) AS n_pairs,
                     CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS xcorr_r
              FROM m ORDER BY lag"""),
      doc = "lead-lag cross-correlation (click vs purchase daily cents, lags " +
        "-3..+3): broadcast literal lag table on shifted day index, exact " +
        "decimal moments, agg_pearson_exact IEEE finish"),

    // ---- Sample autocorrelation function (ACF, lags 1..7) of the daily
    // event count — the lag-selection diagnostic feeding ts_ewma /
    // ts_holt_trend / ts_weekday_profile (is there weekly structure worth
    // a seasonal term?). Textbook estimator: full-series mean and
    // variance denominator, truncated numerator pairs — NOT pairwise
    // Pearson-at-lag (that's ts_cross_correlation's estimator).
    // Cross-multiplied exact: deviations ride as n·x−S in DECIMAL(38,0),
    // one IEEE division num/den at the end. The day series is
    // calendar-bounded (≤31 groups here, ≤366/yr at any scale), so every
    // join side past the first groupBy is literal-small.
    GQuery("ts_autocorr",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(count(lit(1)).cast("decimal(38,0)").as("x"))
        val st = daily.agg(sum(col("x")).as("sx"),
          count(lit(1)).cast("decimal(38,0)").as("n"))
        val dev = daily.crossJoin(broadcast(st))
          .select(col("d"), (col("n") * col("x") - col("sx")).as("e"))
        val den = dev.agg(sum(col("e") * col("e")).as("den"))
        val lags = s.range(1, 8).select(col("id").as("lag"))
        val b = dev.select(col("d").as("db"), col("e").as("eb"))
        dev.crossJoin(broadcast(lags))
          .join(b, col("db") === col("d") + col("lag"))
          .groupBy(col("lag"))
          .agg(count(lit(1)).as("n_pairs"), sum(col("e") * col("eb")).as("num"))
          .crossJoin(broadcast(den))
          .select(col("lag"), col("n_pairs"),
            expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)").as("acf_r"))
          .orderBy(col("lag"))
      },
      Some("""WITH daily AS (
              |  SELECT epoch_us(ts) // 86400000000 AS d,
              |         CAST(count(*) AS HUGEINT) AS x
              |  FROM events GROUP BY 1),
              |st AS (SELECT CAST(SUM(x) AS HUGEINT) AS sx,
              |              CAST(count(*) AS HUGEINT) AS n FROM daily),
              |dev AS (SELECT d, n * x - sx AS e FROM daily, st),
              |den AS (SELECT SUM(e * e) AS den FROM dev),
              |lags AS (SELECT unnest(range(1, 8)) AS lag),
              |m AS (SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
              |             SUM(a.e * b.e) AS num
              |      FROM dev a, lags l JOIN dev b ON b.d = a.d + l.lag
              |      GROUP BY l.lag)
              |SELECT lag, n_pairs, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS acf_r
              |FROM m, den ORDER BY lag""".stripMargin),
      doc = "sample ACF lags 1..7 of the daily event count: full-series mean " +
        "and variance, cross-multiplied n·x−S exact deviations, one IEEE " +
        "num/den finish — the seasonality/lag-selection diagnostic"),

    // ---- Benford first-digit audit: fabricated or unit-mixed monetary
    // data drifts from log10(1+1/d). First digit via integer-floor →
    // string head (NO log10 — float log near powers of ten is the
    // classic cross-engine divergence); expected shares are the same
    // 1e4-scaled literals on both sides. One groupBy(9 values) + scalar
    // total.
    GQuery("audit_benford",
      (s, dir) => {
        import s.implicits._
        val expected = Seq(1 -> 3010, 2 -> 1761, 3 -> 1249, 4 -> 969,
          5 -> 792, 6 -> 669, 7 -> 580, 8 -> 512, 9 -> 458)
          .toDF("digit", "expected_e4")
        val digits = Tables.orders(s, dir)
          .select(expr("CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS INT)")
            .as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
        val tot = digits.agg(sum(col("n_orders")).as("n_total"))
        digits.crossJoin(broadcast(tot))
          .join(broadcast(expected), Seq("digit"))
          .select(col("digit"), col("n_orders"),
            expr("n_orders * 10000 div n_total").as("share_e4"),
            col("expected_e4"),
            expr("abs(n_orders * 10000 div n_total - expected_e4)").as("dev_e4"))
          .orderBy(col("digit"))
      },
      Some("""WITH e(digit, expected_e4) AS (VALUES
                (1, 3010), (2, 1761), (3, 1249), (4, 969), (5, 792),
                (6, 669), (7, 580), (8, 512), (9, 458)),
              d AS (
                SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
                       count(*) AS n_orders
                FROM orders GROUP BY 1),
              t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total FROM d)
              SELECT d.digit, d.n_orders,
                     d.n_orders * 10000 // t.n_total AS share_e4,
                     e.expected_e4,
                     abs(d.n_orders * 10000 // t.n_total - e.expected_e4) AS dev_e4
              FROM d, t JOIN e ON e.digit = d.digit
              ORDER BY d.digit"""),
      doc = "Benford first-digit audit: integer-floor string-head digit (no " +
        "log10), observed vs literal expected shares at 1e4 scale"),

    // ---- Sequential path motifs — the order-k sibling of
    // markov_transitions' bigrams: the top 3-step event paths users
    // actually walk. Two lead() taps on ONE user-partitioned window
    // (same shuffle as any per-user sequence op), then a bounded
    // (|event types|³) census and a TakeOrdered top-10; ties
    // lexicographic so the cut is deterministic.
    GQuery("funnel_path_motifs",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("e2", lead(col("event_type"), 1).over(w))
          .withColumn("e3", lead(col("event_type"), 2).over(w))
          .filter(col("e3").isNotNull)
          .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
            col("e3").as("step3"))
          .agg(count(lit(1)).as("n_paths"))
          .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
          .limit(10)
      },
      Some("""WITH seq AS (
                SELECT event_type AS step1,
                       LEAD(event_type, 1) OVER w AS step2,
                       LEAD(event_type, 2) OVER w AS step3
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
              SELECT step1, step2, step3, count(*) AS n_paths
              FROM seq WHERE step3 IS NOT NULL
              GROUP BY 1, 2, 3
              ORDER BY n_paths DESC, step1, step2, step3 LIMIT 10"""),
      doc = "top-10 3-step user path motifs: two lead() taps on one " +
        "user-partitioned window, |types|^3-bounded census, deterministic cut"),

    // ---- Forecast backtest: last-value vs seasonal-naive (lag-7)
    // baselines scored on the final week — the model-free accuracy floor
    // any real forecaster must beat, and the capacity-planning readout
    // itself. Errors stay integer cents (SAE + signed bias compare
    // exactly); MAE is the one double division at the end. Two lag taps
    // on one type-partitioned window; the winner verdict compares
    // integer SAEs, never floats.
    GQuery("ts_backtest_naive",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val mx = daily.agg(max(col("d")).as("maxd"))
        daily
          .withColumn("prev1", lag(col("cents"), 1).over(w))
          .withColumn("prev7", lag(col("cents"), 7).over(w))
          .crossJoin(broadcast(mx))
          .filter(col("d") > col("maxd") - 7 && col("prev7").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days_eval"),
            sum(abs(col("cents") - col("prev1"))).as("sae_naive"),
            sum(abs(col("cents") - col("prev7"))).as("sae_seasonal"),
            sum(col("cents") - col("prev1")).as("bias_naive"),
            sum(col("cents") - col("prev7")).as("bias_seasonal"))
          .select(col("event_type"), col("n_days_eval"),
            col("sae_naive"), col("sae_seasonal"),
            (col("sae_naive").cast("double") / col("n_days_eval")).as("mae_naive"),
            (col("sae_seasonal").cast("double") / col("n_days_eval")).as("mae_seasonal"),
            col("bias_naive"), col("bias_seasonal"),
            when(col("sae_seasonal") < col("sae_naive"), lit("seasonal"))
              .when(col("sae_seasonal") > col("sae_naive"), lit("naive"))
              .otherwise(lit("tie")).as("winner"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
                SELECT event_type, epoch_us(ts) // 86400000000 AS d,
                       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
                FROM events GROUP BY 1, 2),
              mx AS (SELECT max(d) AS maxd FROM daily),
              f AS (
                SELECT event_type, d, cents,
                       lag(cents, 1) OVER w AS prev1,
                       lag(cents, 7) OVER w AS prev7
                FROM daily
                WINDOW w AS (PARTITION BY event_type ORDER BY d)),
              e AS (SELECT f.* FROM f, mx
                    WHERE f.d > mx.maxd - 7 AND f.prev7 IS NOT NULL),
              m AS (
                SELECT event_type, count(*) AS n_days_eval,
                       CAST(SUM(abs(cents - prev1)) AS BIGINT) AS sae_naive,
                       CAST(SUM(abs(cents - prev7)) AS BIGINT) AS sae_seasonal,
                       CAST(SUM(cents - prev1) AS BIGINT) AS bias_naive,
                       CAST(SUM(cents - prev7) AS BIGINT) AS bias_seasonal
                FROM e GROUP BY event_type)
              SELECT event_type, n_days_eval, sae_naive, sae_seasonal,
                     CAST(sae_naive AS DOUBLE) / n_days_eval AS mae_naive,
                     CAST(sae_seasonal AS DOUBLE) / n_days_eval AS mae_seasonal,
                     bias_naive, bias_seasonal,
                     CASE WHEN sae_seasonal < sae_naive THEN 'seasonal'
                          WHEN sae_seasonal > sae_naive THEN 'naive'
                          ELSE 'tie' END AS winner
              FROM m ORDER BY event_type"""),
      doc = "forecast backtest: last-value vs seasonal-naive (lag-7) on the " +
        "final week; exact integer SAE/bias, one double division for MAE, " +
        "integer-compared winner verdict"),

    // ---- Theil-Sen robust trend: the median of all pairwise daily
    // slopes — a 29%-breakdown estimator where OLS (agg_regression_exact)
    // is wrecked by one outlier day. The pairwise join is over the
    // CALENDAR-BOUNDED daily table (≤31 rows/type → ≤465 pairs), so the
    // quadratic is bounded, never corpus-scale; each slope is one IEEE
    // division, the lower median is a rank pick with a full
    // deterministic order (slope, d1, d2).
    GQuery("ts_theilsen_trend",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
        val a = daily.select(col("event_type"), col("d").as("d1"),
          col("cents").as("c1"))
        val b = daily.select(col("event_type"), col("d").as("d2"),
          col("cents").as("c2"))
        val pairs = a.join(b, Seq("event_type")).filter(col("d1") < col("d2"))
          .withColumn("slope",
            (col("c2") - col("c1")).cast("double") / (col("d2") - col("d1")))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("slope"), col("d1"), col("d2"))
        pairs.withColumn("r", row_number().over(w))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy(col("event_type"))))
          .filter(col("r") === expr("CAST(ceil(n / 2.0) AS BIGINT)"))
          .select(col("event_type"), col("n").as("n_pairs"),
            col("slope").as("theilsen_cents_per_day"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
                SELECT event_type, epoch_us(ts) // 86400000000 AS d,
                       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
                FROM events GROUP BY 1, 2),
              p AS (
                SELECT a.event_type, a.d AS d1, b.d AS d2,
                       CAST(b.cents - a.cents AS DOUBLE) / (b.d - a.d) AS slope
                FROM daily a JOIN daily b
                  ON a.event_type = b.event_type AND a.d < b.d),
              r AS (
                SELECT event_type, slope,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                         ORDER BY slope, d1, d2) AS r,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM p)
              SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
                     slope AS theilsen_cents_per_day
              FROM r WHERE r = CAST(ceil(n / 2.0) AS BIGINT)
              ORDER BY event_type"""),
      doc = "Theil-Sen robust trend per type: lower median of all pairwise " +
        "slopes over the calendar-bounded daily table (<=465 pairs/type)"),

    // ---- NEAREST as-of (merge_asof direction='nearest'): the closest
    // signup in EITHER direction, ties toward the past — completing the
    // backward/forward/tolerance family by COMPOSING the two union+window
    // as-of ops and arbitrating with integer-µs distances. Tie semantics
    // inherit the ops' deterministic payload-column ordering (backward:
    // greatest id at equal ts; forward: smallest), which the oracle's
    // struct-extrema mirror exactly. Two key shuffles total, no pair
    // explosion.
    GQuery("asof_nearest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("s_ts"),
            col("event_id").as("signup_event_id"))
        val back = graft.ops.AsOfJoin.asOf(purchases, signups, Seq("user_id"),
            "ts", "s_ts", Seq("signup_event_id", "s_ts"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("signup_event_id").as("b_id"), col("s_ts").as("b_ts"))
        val fwd = graft.ops.AsOfJoin.asOfForward(purchases, signups,
            Seq("user_id"), "ts", "s_ts", Seq("signup_event_id", "s_ts"))
          .select(col("event_id"), col("signup_event_id").as("f_id"),
            col("s_ts").as("f_ts"))
        back.join(fwd, Seq("event_id"))
          .withColumn("b_diff", expr("unix_micros(ts) - unix_micros(b_ts)"))
          .withColumn("f_diff", expr("unix_micros(f_ts) - unix_micros(ts)"))
          .withColumn("nearest_signup",
            when(col("b_ts").isNull && col("f_ts").isNull, lit(null))
              .when(col("f_ts").isNull, col("b_id"))
              .when(col("b_ts").isNull, col("f_id"))
              .when(col("b_diff") <= col("f_diff"), col("b_id"))
              .otherwise(col("f_id")))
          .withColumn("direction",
            when(col("b_ts").isNull && col("f_ts").isNull,
              lit(null).cast("string"))
              .when(col("f_ts").isNull ||
                (col("b_ts").isNotNull && col("b_diff") <= col("f_diff")),
                lit("backward"))
              .otherwise(lit("forward")))
          .withColumn("wait_us",
            when(col("direction") === "backward", col("b_diff"))
              .when(col("direction") === "forward", col("f_diff")))
          .select(col("event_id"), col("user_id"), col("nearest_signup"),
            col("direction"), col("wait_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'purchase'),
              s AS (SELECT user_id, ts AS s_ts, event_id AS sid FROM events
                    WHERE event_type = 'signup'),
              agg AS (
                SELECT p.event_id, p.user_id, p.ts,
                       max(CASE WHEN s.s_ts <= p.ts
                                THEN {'t': s.s_ts, 'id': s.sid} END) AS b,
                       min(CASE WHEN s.s_ts >= p.ts
                                THEN {'t': s.s_ts, 'id': s.sid} END) AS f
                FROM p LEFT JOIN s ON s.user_id = p.user_id
                GROUP BY p.event_id, p.user_id, p.ts),
              d AS (
                SELECT event_id, user_id,
                       epoch_us(ts) - epoch_us(b.t) AS b_diff,
                       epoch_us(f.t) - epoch_us(ts) AS f_diff,
                       b.id AS b_id, f.id AS f_id
                FROM agg)
              SELECT event_id, user_id,
                     CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                          WHEN f_id IS NULL THEN b_id
                          WHEN b_id IS NULL THEN f_id
                          WHEN b_diff <= f_diff THEN b_id
                          ELSE f_id END AS nearest_signup,
                     CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                          WHEN f_id IS NULL OR (b_id IS NOT NULL AND b_diff <= f_diff)
                            THEN 'backward'
                          ELSE 'forward' END AS direction,
                     CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                          WHEN f_id IS NULL OR (b_id IS NOT NULL AND b_diff <= f_diff)
                            THEN b_diff
                          ELSE f_diff END AS wait_us
              FROM d ORDER BY event_id"""),
      doc = "nearest as-of (merge_asof direction='nearest'): backward + " +
        "forward as-of composed, integer-us arbitration, ties toward the past"),

    // ---- The typed TopKAggregator registered as a SQL-callable UDAF —
    // the §2.7 surface for ANALYSTS: the same bounded-buffer partial-agg
    // machinery the Scala API uses, reachable from spark.sql() as
    // `graft_top3(id, score)` (the udaf() bridge flattens the case-class
    // input to positional args); the exploded array is the per-type top-3.
    GQuery("sql_registered_udaf",
      (s, dir) => {
        s.udf.register("graft_top3",
          org.apache.spark.sql.functions.udaf(graft.functions.TopKAggregator.topK(3)))
        Tables.events(s, dir).createOrReplaceTempView("graft_events_udaf")
        s.sql("""SELECT event_type,
                        posexplode(graft_top3(event_id, value)) AS (pos, top)
                 FROM graft_events_udaf GROUP BY event_type""")
          .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
            col("top.id").as("event_id"), col("top.score").as("value"))
          .orderBy(col("event_type"), col("rank"))
      },
      Some("""SELECT event_type, CAST(r AS INT) AS rank, event_id, value
              FROM (
                SELECT event_type, event_id, value,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                         ORDER BY value DESC, event_id) AS r
                FROM events)
              WHERE r <= 3 ORDER BY event_type, rank"""),
      doc = "typed TopKAggregator registered as a SQL UDAF (udaf() bridge): " +
        "spark.sql top-3 per type == the window formulation"),

    // ---- Out-of-orderness census — the measured input behind every
    // `withWatermark` delay in streaming/: per type, how far events
    // arrive (arrival order = event_id) behind the running event-time
    // high-water mark. Disorder = prior running max ts − own ts (µs,
    // clamped at 0); the report gives the exact late-row count any
    // candidate watermark delay would drop. One type-partitioned window.
    GQuery("streaming_disorder_census",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .withColumn("us", expr("unix_micros(ts)"))
          .withColumn("disorder",
            greatest(lit(0L), coalesce(max(col("us")).over(w), lit(0L)) - col("us")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            count(when(col("disorder") > 0, lit(1))).as("n_out_of_order"),
            max(col("disorder")).as("max_disorder_us"),
            count(when(col("disorder") > 3600L * 1000000, lit(1)))
              .as("n_dropped_by_1h_watermark"),
            count(when(col("disorder") > 24L * 3600 * 1000000, lit(1)))
              .as("n_dropped_by_1d_watermark"))
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (
                SELECT event_type,
                       GREATEST(0, COALESCE(MAX(epoch_us(ts)) OVER (
                         PARTITION BY event_type ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         - epoch_us(ts)) AS disorder
                FROM events)
              SELECT event_type, count(*) AS n_events,
                     CAST(count(*) FILTER (disorder > 0) AS BIGINT) AS n_out_of_order,
                     CAST(MAX(disorder) AS BIGINT) AS max_disorder_us,
                     CAST(count(*) FILTER (disorder > CAST(3600 AS BIGINT) * 1000000) AS BIGINT)
                       AS n_dropped_by_1h_watermark,
                     CAST(count(*) FILTER (disorder > CAST(24 AS BIGINT) * 3600 * 1000000) AS BIGINT)
                       AS n_dropped_by_1d_watermark
              FROM d GROUP BY event_type ORDER BY event_type"""),
      doc = "out-of-orderness census: running event-time high-water-mark lag " +
        "per type (us), exact late-row counts for candidate watermark delays"),

    // ---- Gini inequality per type — the distribution-shape sibling of
    // the HHI concentration census: G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx)
    // over value-ranked cents. Σi·x is invariant under permutation of
    // equal values, so tie order cannot move the result (still pinned by
    // event_id for plan determinism); numerator/denominator stay exact
    // int64, one terminal double division. Rank window is type-partitioned.
    GQuery("agg_gini_concentration",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("cents"), col("event_id"))
        Tables.events(s, dir)
          .select(col("event_type"), col("event_id"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
          .withColumn("i", row_number().over(w).cast("long"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
            sum(col("i") * col("cents")).as("six"))
          .select(col("event_type"), col("n"), col("sx"),
            (lit(2L) * col("six") - (col("n") + 1) * col("sx")).as("gini_num"),
            (col("n") * col("sx")).as("gini_den"))
          .withColumn("gini",
            col("gini_num").cast("double") / col("gini_den"))
          .orderBy(col("event_type"))
      },
      Some("""WITH r AS (
                SELECT event_type,
                       CAST(floor(value * 100) AS BIGINT) AS cents,
                       CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                         ORDER BY CAST(floor(value * 100) AS BIGINT), event_id)
                         AS BIGINT) AS i
                FROM events),
              m AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                       CAST(SUM(cents) AS BIGINT) AS sx,
                       CAST(SUM(i * cents) AS BIGINT) AS six
                FROM r GROUP BY event_type)
              SELECT event_type, n, sx,
                     2 * six - (n + 1) * sx AS gini_num,
                     n * sx AS gini_den,
                     CAST(2 * six - (n + 1) * sx AS DOUBLE) / (n * sx) AS gini
              FROM m ORDER BY event_type"""),
      doc = "Gini inequality per type: tie-invariant ranked-sum formula, " +
        "exact int64 numerator/denominator, one terminal double division"),

    // ---- Inter-event gap histogram — the measured input behind the
    // sessionization gap parameter (as streaming_disorder_census is to
    // the watermark delay): per-user consecutive gaps bucketed by
    // floor(log2(µs)) WITHOUT float log — the bucket is the binary
    // string length (Spark bin() == DuckDB printf('%b')), exact on both
    // engines. The knee in this histogram IS the session gap.
    GQuery("sessionization_gap_histogram",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("us", expr("unix_micros(ts)"))
          .withColumn("prev", lag(col("us"), 1).over(w))
          .filter(col("prev").isNotNull)
          .withColumn("gap_us", col("us") - col("prev"))
          .withColumn("log2_bucket",
            when(col("gap_us") === 0, lit(-1))
              .otherwise(length(expr("bin(gap_us)")) - 1).cast("int"))
          .groupBy(col("log2_bucket"))
          .agg(count(lit(1)).as("n_gaps"),
            min(col("gap_us")).as("min_gap_us"),
            max(col("gap_us")).as("max_gap_us"))
          .orderBy(col("log2_bucket"))
      },
      Some("""WITH g AS (
                SELECT epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS gap_us
                FROM events),
              b AS (
                SELECT gap_us,
                       CASE WHEN gap_us = 0 THEN -1
                            ELSE CAST(length(printf('%b', gap_us)) - 1 AS INT)
                       END AS log2_bucket
                FROM g WHERE gap_us IS NOT NULL)
              SELECT log2_bucket, count(*) AS n_gaps,
                     CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
                     CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
              FROM b GROUP BY log2_bucket ORDER BY log2_bucket"""),
      doc = "inter-event gap log2 histogram (the session-gap decision " +
        "input): float-free buckets via binary-string length, exact both engines"),

    // ---- Exact WEIGHTED median — the estimator agg_percentiles can't
    // give (every row votes with its quantity, not once): smallest price
    // whose cumulative quantity reaches half the group's total. Integer
    // cents/quantities, one flag-partitioned cumulative window, the
    // qualifying-row minimum is an aggregate (no second window).
    GQuery("agg_weighted_median",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"),
          floor(col("l_quantity")).cast("long").as("qty"),
          col("l_orderkey"), col("l_linenumber"))
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = li.groupBy(col("l_returnflag"))
          .agg(sum(col("qty")).as("tot_qty"))
        li.withColumn("cumw", sum(col("qty")).over(w))
          .join(broadcast(tot), Seq("l_returnflag"))
          .filter(col("cumw") * 2 >= col("tot_qty"))
          .groupBy(col("l_returnflag"))
          .agg(max(col("tot_qty")).as("tot_qty"),
            min(col("cents")).as("wmedian_cents"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH li AS (
                SELECT l_returnflag,
                       CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
                       CAST(floor(l_quantity) AS BIGINT) AS qty,
                       l_orderkey, l_linenumber
                FROM lineitem),
              c AS (
                SELECT l_returnflag, cents, qty,
                       SUM(qty) OVER (PARTITION BY l_returnflag
                         ORDER BY cents, l_orderkey, l_linenumber
                         ROWS UNBOUNDED PRECEDING) AS cumw,
                       SUM(qty) OVER (PARTITION BY l_returnflag) AS tot_qty
                FROM li)
              SELECT l_returnflag,
                     CAST(MAX(tot_qty) AS BIGINT) AS tot_qty,
                     CAST(MIN(cents) AS BIGINT) AS wmedian_cents
              FROM c WHERE cumw * 2 >= tot_qty
              GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "exact weighted median per flag: every row votes with its " +
        "quantity; integer cumulative-weight rank selection, no second window"),

    // ---- parse_url breadth — the host/path/query splitter a web-corpus
    // pipeline runs on every crawl record (registered-domain grouping,
    // dedup keys, robots scoping). URLs are synthesized from corpus
    // columns so the oracle can mirror the extraction with plain string
    // algebra (DuckDB has no parse_url).
    GQuery("o24_url_parse",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example/doc/"), col("doc_id"), lit("?lang="), col("lang")))
        .select(
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'QUERY', 'lang')").as("qlang"),
          expr("parse_url(url, 'PATH')").as("path"))
        .groupBy(col("host"), col("qlang"))
        .agg(count(lit(1)).as("n_urls"),
          min(col("path")).as("min_path"), max(col("path")).as("max_path"))
        .orderBy(col("host"), col("qlang")),
      Some("""SELECT source || '.example' AS host, lang AS qlang,
                     count(*) AS n_urls,
                     MIN('/doc/' || doc_id) AS min_path,
                     MAX('/doc/' || doc_id) AS max_path
              FROM documents GROUP BY 1, 2 ORDER BY host, qlang"""),
      doc = "parse_url host/path/query extraction (web-corpus splitter) == " +
        "string-algebra oracle; per-host/lang census"),

    // ---- Day-of-week seasonality profile — the decomposition input the
    // seasonal-naive backtest (lag-7) implicitly assumes: per (type, dow)
    // the seasonal index as an EXACT rational, (dow_sum·N·10⁴) div
    // (total_sum·n_dow) — means never materialize as floats. Epoch day 0
    // is a Thursday, so dow = (d + 4) % 7 with Sunday = 0.
    GQuery("ts_weekday_profile",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
          .withColumn("dow", expr("(d + 4) % 7"))
        val tot = daily.groupBy(col("event_type"))
          .agg(sum(col("cents")).as("s_all"), count(lit(1)).as("n_all"))
        daily.groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("dow_cents"))
          .join(broadcast(tot), Seq("event_type"))
          .withColumn("seasonal_index_e4", expr(
            """CAST(dow_cents AS DECIMAL(38,0)) * n_all * 10000
               div (CAST(s_all AS DECIMAL(38,0)) * n_days)"""))
          .select(col("event_type"), col("dow"), col("n_days"),
            col("dow_cents"), col("seasonal_index_e4"))
          .orderBy(col("event_type"), col("dow"))
      },
      Some("""WITH daily AS (
                SELECT event_type, epoch_us(ts) // 86400000000 AS d,
                       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
                FROM events GROUP BY 1, 2),
              dw AS (SELECT event_type, (d + 4) % 7 AS dow, cents FROM daily),
              tot AS (SELECT event_type, CAST(SUM(cents) AS BIGINT) AS s_all,
                             CAST(count(*) AS BIGINT) AS n_all
                      FROM dw GROUP BY event_type),
              g AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_days,
                           CAST(SUM(cents) AS BIGINT) AS dow_cents
                    FROM dw GROUP BY 1, 2)
              SELECT g.event_type, g.dow, g.n_days, g.dow_cents,
                     CAST(CAST(g.dow_cents AS HUGEINT) * t.n_all * 10000
                          // (CAST(t.s_all AS HUGEINT) * g.n_days) AS BIGINT)
                       AS seasonal_index_e4
              FROM g JOIN tot t USING (event_type)
              ORDER BY g.event_type, g.dow"""),
      doc = "day-of-week seasonality profile: exact rational seasonal index " +
        "(dow_sum*N*1e4 div total*n_dow), no float means; Sunday = 0"),

    // ---- Classical additive seasonal decomposition (the moving-average
    // STL ancestor): trend = centered 7-day moving average on the CALENDAR
    // (RANGE frame, so gaps shrink the window and incomplete windows are
    // dropped rather than silently biased), detrended carried as the exact
    // cross-multiplied integer 7y − S₇ (never a float MA), seasonal = per
    // day-of-week mean of the detrended series as a sign-split truncating
    // 1e4 rational. Per-type windows partition by event_type — bounded
    // |types|·|corpus days| rows, one shuffle.
    GQuery("ts_seasonal_decompose",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
          .rangeBetween(-3, 3)
        daily
          .withColumn("s7", sum(col("cents")).over(w))
          .withColumn("n7", count(lit(1)).over(w))
          .filter(col("n7") === 7)
          .withColumn("dow", expr("(d + 4) % 7"))
          .withColumn("det7", col("cents") * 7 - col("s7"))
          .groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("det7")).as("detr_sum"))
          .withColumn("seasonal_e4", expr(
            """CAST(CASE WHEN detr_sum < 0
              |  THEN -((-(10000 * CAST(detr_sum AS DECIMAL(38,0))))
              |         div (7 * n_days))
              |  ELSE (10000 * CAST(detr_sum AS DECIMAL(38,0))) div (7 * n_days)
              |END AS BIGINT)""".stripMargin))
          .orderBy(col("event_type"), col("dow"))
      },
      Some("""WITH daily AS (
              |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
              |         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
              |  FROM events GROUP BY 1, 2),
              |win AS (
              |  SELECT event_type, d, cents,
              |         CAST(SUM(cents) OVER w AS BIGINT) AS s7,
              |         count(*) OVER w AS n7
              |  FROM daily
              |  WINDOW w AS (PARTITION BY event_type ORDER BY d
              |               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
              |det AS (
              |  SELECT event_type, (d + 4) % 7 AS dow, cents * 7 - s7 AS det7
              |  FROM win WHERE n7 = 7)
              |SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_days,
              |       CAST(SUM(det7) AS BIGINT) AS detr_sum,
              |       CAST(CASE WHEN SUM(det7) < 0
              |              THEN -((-(10000 * CAST(SUM(det7) AS HUGEINT)))
              |                     // (7 * count(*)))
              |              ELSE (10000 * CAST(SUM(det7) AS HUGEINT))
              |                     // (7 * count(*))
              |            END AS BIGINT) AS seasonal_e4
              |FROM det GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "classical additive seasonal decomposition: centered 7-day " +
        "calendar-RANGE moving-average trend (complete windows only), " +
        "exact 7y - S7 integer detrending, per-dow seasonal as sign-split " +
        "1e4 rational"),

    // ---- Seasonal-residual anomaly flags: the decomposition's consumer
    // — a day is anomalous when its deseasonalized residual deviates
    // from the per-type median by more than 3 MADs (the robust 3-sigma).
    // Residual carried as the EXACT integer det7·10⁴ − 7·seasonal_e4
    // (the decompose pipeline's own scale, never a float); median and
    // MAD are LOWER medians pinned by (value, day) row_number — order
    // statistics, deterministic cross-engine where mean/stddev float
    // folds are not. Windows partition by event_type (bounded
    // |types|·|days| rows); flags surface per scored day.
    GQuery("ts_stl_anomaly",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
          .rangeBetween(-3, 3)
        val det = daily
          .withColumn("s7", sum(col("cents")).over(w))
          .withColumn("n7", count(lit(1)).over(w))
          .filter(col("n7") === 7)
          .withColumn("dow", expr("(d + 4) % 7"))
          .withColumn("det7", col("cents") * 7 - col("s7"))
          .localCheckpoint(true) // feeds seasonal agg AND the residual join
        val seas = det.groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n_days"), sum(col("det7")).as("detr_sum"))
          .withColumn("seasonal_e4", expr(
            """CAST(CASE WHEN detr_sum < 0
              |  THEN -((-(10000 * CAST(detr_sum AS DECIMAL(38,0))))
              |         div (7 * n_days))
              |  ELSE (10000 * CAST(detr_sum AS DECIMAL(38,0))) div (7 * n_days)
              |END AS BIGINT)""".stripMargin))
          .select(col("event_type"), col("dow"), col("seasonal_e4"))
        val resid = det.join(seas, Seq("event_type", "dow"))
          .select(col("event_type"), col("d"),
            (col("det7") * 10000 - col("seasonal_e4") * 7).as("r"))
        val wOrd = Window.partitionBy(col("event_type"))
          .orderBy(col("r"), col("d"))
        val wN = Window.partitionBy(col("event_type"))
        val med = resid
          .withColumn("rn", row_number().over(wOrd))
          .withColumn("n", count(lit(1)).over(wN))
          .filter(expr("rn = (n + 1) div 2"))
          .select(col("event_type"), col("r").as("med"))
        val dev = resid.join(med, Seq("event_type"))
          .select(col("event_type"), col("d"), col("r"),
            abs(col("r") - col("med")).as("dv"))
          .localCheckpoint(true) // feeds the MAD order statistic AND output
        val wDev = Window.partitionBy(col("event_type"))
          .orderBy(col("dv"), col("d"))
        val mad = dev
          .withColumn("rn", row_number().over(wDev))
          .withColumn("n", count(lit(1)).over(wN))
          .filter(expr("rn = (n + 1) div 2"))
          .select(col("event_type"), col("dv").as("mad"))
        dev.join(mad, Seq("event_type"))
          .select(col("event_type"), col("d"), col("r").as("resid_x7e4"),
            col("dv").as("dev_x7e4"), col("mad").as("mad_x7e4"),
            expr("CAST(CASE WHEN dv > 3 * mad THEN 1 ELSE 0 END AS INT)")
              .as("is_anomaly"))
          .orderBy(col("event_type"), col("d"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
             |         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM events GROUP BY 1, 2),
             |win AS (
             |  SELECT event_type, d, cents,
             |         CAST(SUM(cents) OVER w AS BIGINT) AS s7, count(*) OVER w AS n7
             |  FROM daily
             |  WINDOW w AS (PARTITION BY event_type ORDER BY d
             |               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |det AS (
             |  SELECT event_type, d, (d + 4) % 7 AS dow, cents * 7 - s7 AS det7
             |  FROM win WHERE n7 = 7),
             |seas AS (
             |  SELECT event_type, dow,
             |         CAST(CASE WHEN SUM(det7) < 0
             |                THEN -((-(10000 * CAST(SUM(det7) AS HUGEINT))) // (7 * count(*)))
             |                ELSE (10000 * CAST(SUM(det7) AS HUGEINT)) // (7 * count(*))
             |              END AS BIGINT) AS seasonal_e4
             |  FROM det GROUP BY 1, 2),
             |resid AS (
             |  SELECT t.event_type, t.d,
             |         CAST(t.det7 AS BIGINT) * 10000 - 7 * s.seasonal_e4 AS r
             |  FROM det t JOIN seas s ON s.event_type = t.event_type AND s.dow = t.dow),
             |medr AS (
             |  SELECT event_type, r AS med FROM (
             |    SELECT event_type, r,
             |           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r, d) AS rn,
             |           count(*) OVER (PARTITION BY event_type) AS n
             |    FROM resid) WHERE rn = (n + 1) // 2),
             |dev AS (
             |  SELECT r.event_type, r.d, r.r, abs(r.r - m.med) AS dv
             |  FROM resid r JOIN medr m USING (event_type)),
             |madr AS (
             |  SELECT event_type, dv AS mad FROM (
             |    SELECT event_type, dv, d,
             |           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dv, d) AS rn,
             |           count(*) OVER (PARTITION BY event_type) AS n
             |    FROM dev) WHERE rn = (n + 1) // 2)
             |SELECT v.event_type, CAST(v.d AS BIGINT) AS d, v.r AS resid_x7e4,
             |       v.dv AS dev_x7e4, m.mad AS mad_x7e4,
             |       CAST(CASE WHEN v.dv > 3 * m.mad THEN 1 ELSE 0 END AS INT) AS is_anomaly
             |FROM dev v JOIN madr m USING (event_type)
             |ORDER BY v.event_type, v.d""".stripMargin),
      doc = "seasonal-residual anomaly flags: exact-integer deseasonalized " +
        "residual (det7*1e4 - 7*seasonal) graded against 3x the per-type " +
        "MAD, median/MAD as deterministic lower-median order statistics " +
        "— the decomposition's robust-3-sigma consumer"),

    // ---- Changepoint by binary segmentation (one split): the WHERE
    // answer next to ts_cusum's "did it drift" — per event_type, the
    // split day t maximizing the between-segment sum of squares
    // BSS(t) = (S_l·n_r − S_r·n_l)²/(n·n_l·n_r). n is constant per type,
    // so the argmax rides score = a²·10⁶ div (n_l·n_r) with
    // a = S_l·n_r − S_r·n_l — an EXACT DECIMAL(38,0) integer (a ≤ ~10¹⁰,
    // a² ≤ 10²⁰, ×10⁶ ≤ 10²⁶), totally ordered identically in both
    // engines; ties break to the earlier day. Candidate splits keep ≥2
    // days per side. Window partitions by event_type over the
    // calendar-bounded daily table.
    GQuery("ts_changepoint_binseg",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
        val wCum = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val wAll = Window.partitionBy(col("event_type"))
        val scored = daily
          .withColumn("k", row_number().over(wCum))
          .withColumn("s_l", sum(col("cents")).over(wCum))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("s", sum(col("cents")).over(wAll))
          .filter(col("k") >= 2 && col("k") <= col("n") - 2)
          .withColumn("a", expr(
            """CAST(s_l AS DECIMAL(38,0)) * (n - k)
               - CAST(s - s_l AS DECIMAL(38,0)) * k"""))
          .withColumn("score", expr("(a * a * 1000000) div (k * (n - k))"))
        val wBest = Window.partitionBy(col("event_type"))
          .orderBy(col("score").desc, col("d"))
        scored.withColumn("r", row_number().over(wBest))
          .filter(col("r") === 1)
          .select(col("event_type"), col("d").as("split_day"),
            col("k").cast("long").as("n_left"),
            (col("n") - col("k")).cast("long").as("n_right"),
            expr("100 * s_l div k").as("mean_left_e2"),
            expr("CAST(100 * CAST(s - s_l AS DECIMAL(38,0)) div (n - k) AS BIGINT)")
              .as("mean_right_e2"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
              |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
              |         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
              |  FROM events GROUP BY 1, 2),
              |cum AS (
              |  SELECT event_type, d, cents,
              |         ROW_NUMBER() OVER w AS k,
              |         CAST(SUM(cents) OVER w AS BIGINT) AS s_l,
              |         count(*) OVER (PARTITION BY event_type) AS n,
              |         CAST(SUM(cents) OVER (PARTITION BY event_type) AS BIGINT) AS s
              |  FROM daily
              |  WINDOW w AS (PARTITION BY event_type ORDER BY d
              |               ROWS UNBOUNDED PRECEDING)),
              |scored AS (
              |  SELECT event_type, d, k, n, s_l, s,
              |         (CAST(s_l AS HUGEINT) * (n - k)
              |          - CAST(s - s_l AS HUGEINT) * k) AS a
              |  FROM cum WHERE k >= 2 AND k <= n - 2),
              |best AS (
              |  SELECT event_type, d, k, n, s_l, s,
              |         (a * a * 1000000) // (k * (n - k)) AS score,
              |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY
              |           (a * a * 1000000) // (k * (n - k)) DESC, d) AS r
              |  FROM scored)
              |SELECT event_type, d AS split_day,
              |       CAST(k AS BIGINT) AS n_left,
              |       CAST(n - k AS BIGINT) AS n_right,
              |       CAST(100 * s_l // k AS BIGINT) AS mean_left_e2,
              |       CAST(100 * CAST(s - s_l AS HUGEINT) // (n - k) AS BIGINT)
              |         AS mean_right_e2
              |FROM best WHERE r = 1 ORDER BY event_type""".stripMargin),
      doc = "changepoint by binary segmentation: per-type argmax of the " +
        "exact cross-multiplied between-segment sum of squares (DECIMAL " +
        "integers end-to-end, earlier-day ties), >=2 days per side"),

    // ---- Wald-Wolfowitz runs test — is the daily series RANDOM around
    // its median, or trending/cyclic? Signs vs the exact per-type lower
    // median (ties discarded, the classic convention), runs counted as
    // sign-change islands on the calendar-bounded table, and the null
    // expectation 1 + 2ab/(a+b) carried as an exact 1e4 rational. Too few
    // runs ⇒ trend; too many ⇒ oscillation — the CUSUM/Theil-Sen
    // cross-check.
    GQuery("ts_runs_test",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
        val wVal = Window.partitionBy(col("event_type"))
          .orderBy(col("cents"), col("d"))
        val wAll = Window.partitionBy(col("event_type"))
        val med = daily.withColumn("_vr", row_number().over(wVal))
          .withColumn("_n", count(lit(1)).over(wAll))
          .filter(col("_vr") === ceil(col("_n") / 2.0))
          .select(col("event_type"), col("cents").as("med"))
        val signed = daily.join(broadcast(med), Seq("event_type"))
          .filter(col("cents") =!= col("med"))
          .withColumn("above", col("cents") > col("med"))
        val wSeq = Window.partitionBy(col("event_type")).orderBy(col("d"))
        signed
          .withColumn("chg",
            when(lag(col("above"), 1).over(wSeq).isNull ||
              lag(col("above"), 1).over(wSeq) =!= col("above"), 1L).otherwise(0L))
          .groupBy(col("event_type"))
          .agg(count(when(col("above"), lit(1))).as("n_above"),
            count(when(not(col("above")), lit(1))).as("n_below"),
            sum(col("chg")).as("n_runs"))
          .withColumn("expected_runs_e4", expr(
            "10000 + 2 * n_above * n_below * 10000 div (n_above + n_below)"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
                SELECT event_type, epoch_us(ts) // 86400000000 AS d,
                       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
                FROM events GROUP BY 1, 2),
              med AS (
                SELECT event_type, cents AS med FROM (
                  SELECT event_type, cents,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY cents, d) AS vr,
                         COUNT(*) OVER (PARTITION BY event_type) AS n
                  FROM daily) WHERE vr = CAST(ceil(n / 2.0) AS BIGINT)),
              s AS (
                SELECT d.event_type, d.d, d.cents > m.med AS above
                FROM daily d JOIN med m USING (event_type)
                WHERE d.cents <> m.med),
              c AS (
                SELECT event_type, above,
                       CASE WHEN lag(above) OVER w IS NULL
                              OR lag(above) OVER w <> above THEN 1 ELSE 0 END AS chg
                FROM s WINDOW w AS (PARTITION BY event_type ORDER BY d))
              SELECT event_type,
                     CAST(count(*) FILTER (above) AS BIGINT) AS n_above,
                     CAST(count(*) FILTER (NOT above) AS BIGINT) AS n_below,
                     CAST(SUM(chg) AS BIGINT) AS n_runs,
                     10000 + 2 * CAST(count(*) FILTER (above) AS BIGINT)
                       * CAST(count(*) FILTER (NOT above) AS BIGINT) * 10000
                       // (CAST(count(*) AS BIGINT)) AS expected_runs_e4
              FROM c GROUP BY event_type ORDER BY event_type"""),
      doc = "Wald-Wolfowitz runs test per type: sign islands vs the exact " +
        "median (ties discarded), null expectation 1 + 2ab/(a+b) as an exact " +
        "1e4 rational — trend/oscillation cross-check"),

    // ---- Deterministic bootstrap — uncertainty quantification WITHOUT
    // RNG state (engine RNGs never hash-match across systems): replicate
    // b's j-th draw is the row at index md5(b,variant,j) mod n, a pure
    // function of the data, so the whole resampling distribution is
    // reproducible anywhere. 8 replicate means per variant (8n fan-out —
    // one deterministic-index join, no per-row state), spread reported as
    // the sorted replicate extremes + lower median. The A/B error-bar
    // companion to ab_mann_whitney's point test.
    GQuery("ab_bootstrap_means",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .select((col("user_id") % 2).cast("int").as("variant"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"),
            col("event_id"))
        val w = Window.partitionBy(col("variant")).orderBy(col("event_id"))
        val idxed = ev.withColumn("idx", (row_number().over(w) - 1).cast("long"))
        val nTab = idxed.groupBy(col("variant")).agg(count(lit(1)).as("n"))
        val reps = s.range(8).select(col("id").as("b"))
        val draws = idxed.select(col("variant"), col("idx").as("j"))
          .crossJoin(broadcast(reps))
          .join(broadcast(nTab), Seq("variant"))
          .withColumn("tgt", expr(
            "CAST(conv(substring(md5(concat_ws('_', b, variant, j)), 1, 15), 16, 10) AS BIGINT) % n"))
        draws
          .join(idxed.select(col("variant"), col("idx").as("tgt"), col("cents")),
            Seq("variant", "tgt"))
          .groupBy(col("variant"), col("b"))
          .agg((sum(col("cents")).cast("double") / count(lit(1))).as("mean_cents"))
          .groupBy(col("variant"))
          .agg(sort_array(collect_list(col("mean_cents"))).as("ms"))
          .select(col("variant"),
            expr("element_at(ms, 1)").as("boot_lo"),
            expr("element_at(ms, 4)").as("boot_med"),
            expr("element_at(ms, 8)").as("boot_hi"))
          .orderBy(col("variant"))
      },
      Some("""WITH ev AS (
                SELECT CAST(user_id % 2 AS INT) AS variant,
                       CAST(floor(value * 100) AS BIGINT) AS cents, event_id
                FROM events),
              ix AS (
                SELECT variant, cents,
                       CAST(ROW_NUMBER() OVER (PARTITION BY variant
                         ORDER BY event_id) - 1 AS BIGINT) AS idx
                FROM ev),
              nn AS (SELECT variant, CAST(count(*) AS BIGINT) AS n
                     FROM ix GROUP BY variant),
              reps AS (SELECT unnest(range(0, 8)) AS b),
              draws AS (
                SELECT i.variant, r.b,
                       CAST('0x' || substr(md5(r.b || '_' || i.variant || '_' || i.idx), 1, 15)
                            AS BIGINT) % t.n AS tgt
                FROM ix i JOIN nn t USING (variant) CROSS JOIN reps r),
              means AS (
                SELECT d.variant, d.b,
                       CAST(SUM(x.cents) AS DOUBLE) / count(*) AS mean_cents
                FROM draws d JOIN ix x ON x.variant = d.variant AND x.idx = d.tgt
                GROUP BY d.variant, d.b),
              ms AS (SELECT variant, list(mean_cents ORDER BY mean_cents) AS l
                     FROM means GROUP BY variant)
              SELECT variant, l[1] AS boot_lo, l[4] AS boot_med, l[8] AS boot_hi
              FROM ms ORDER BY variant"""),
      doc = "deterministic bootstrap CI: md5-indexed resampling (no RNG " +
        "state), 8 replicate means per variant, sorted extremes + lower median"),

    // ---- Two-sample Kolmogorov-Smirnov — the SHAPE test beside
    // ab_mann_whitney's location test: D = max |F_A − F_B| computed
    // EXACTLY as max |cumA·n_B − cumB·n_A| / (n_A·n_B) over the
    // value-domain cents histogram — no float CDFs, no raw-row sort; the
    // only window is cumulative counts over |distinct cents| rows
    // (guard-adjudicated). The argmax cents (struct-max, min-cents ties)
    // says WHERE the distributions diverge.
    GQuery("ab_ks_test",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .select((col("user_id") % 2).cast("int").as("variant"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
        val hist = ev.groupBy(col("cents")).agg(
          count(when(col("variant") === 0, lit(1))).as("n0"),
          count(when(col("variant") === 1, lit(1))).as("n1"))
        val w = Window.orderBy(col("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cum0", sum(col("n0")).over(w))
          .withColumn("cum1", sum(col("n1")).over(w))
        val tot = hist.agg(sum(col("n0")).as("na"), sum(col("n1")).as("nb"))
        cum.crossJoin(broadcast(tot))
          .withColumn("d_num", abs(col("cum0") * col("nb") - col("cum1") * col("na")))
          .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
            max(struct(col("d_num"), (-col("cents")).as("nc"))).as("mx"))
          .select(col("n_a"), col("n_b"),
            expr("mx.d_num * 10000 div (n_a * n_b)").as("ks_e4"),
            (-col("mx.nc")).as("at_cents"))
      },
      Some("""WITH ev AS (
                SELECT CAST(user_id % 2 AS INT) AS variant,
                       CAST(floor(value * 100) AS BIGINT) AS cents
                FROM events),
              hist AS (
                SELECT cents,
                       CAST(count(*) FILTER (variant = 0) AS BIGINT) AS n0,
                       CAST(count(*) FILTER (variant = 1) AS BIGINT) AS n1
                FROM ev GROUP BY cents),
              cum AS (
                SELECT cents,
                       CAST(SUM(n0) OVER w AS BIGINT) AS cum0,
                       CAST(SUM(n1) OVER w AS BIGINT) AS cum1
                FROM hist
                WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)),
              tot AS (SELECT CAST(SUM(n0) AS BIGINT) AS na,
                             CAST(SUM(n1) AS BIGINT) AS nb FROM hist),
              d AS (
                SELECT c.cents, abs(c.cum0 * t.nb - c.cum1 * t.na) AS d_num,
                       t.na, t.nb
                FROM cum c, tot t)
              SELECT MAX(na) AS n_a, MAX(nb) AS n_b,
                     CAST(max({'d': d_num, 'nc': -cents}).d * 10000
                          // (MAX(na) * MAX(nb)) AS BIGINT) AS ks_e4,
                     -(max({'d': d_num, 'nc': -cents}).nc) AS at_cents
              FROM d"""),
      doc = "two-sample KS test: exact D = max|cumA*nB - cumB*nA|/(nA*nB) " +
        "over the value-domain histogram, argmax cents via struct-max"),

    // Cohort retention — the other half of product analytics next to the
    // funnel: users are cohorted by their FIRST active day, then counted
    // distinct at fixed day offsets. All-day-index integer arithmetic
    // (µs epoch `div` 86400e6), so the census is partitioning-independent
    // and engine-exact.
    GQuery("cohort_retention",
      (s, dir) => {
        val byDay = Tables.events(s, dir)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        val firsts = byDay.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        byDay.join(firsts, Seq("user_id"))
          .withColumn("day_offset", (col("day") - col("cohort_day")).cast("int"))
          .filter(col("day_offset").isin(0, 1, 7, 14))
          .groupBy(col("cohort_day"), col("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .select(
            date_format(timestamp_seconds(col("cohort_day") * 86400), "yyyy-MM-dd")
              .as("cohort"),
            col("day_offset"), col("n_active"))
          .orderBy(col("cohort"), col("day_offset"))
      },
      Some("""WITH d AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
              f AS (
                SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id),
              j AS (
                SELECT d.user_id, f.cohort_day, d.day - f.cohort_day AS day_offset
                FROM d JOIN f USING (user_id))
              SELECT strftime(to_timestamp(cohort_day * 86400), '%Y-%m-%d') AS cohort,
                     CAST(day_offset AS INT) AS day_offset,
                     count(DISTINCT user_id) AS n_active
              FROM j WHERE day_offset IN (0, 1, 7, 14)
              GROUP BY cohort_day, day_offset ORDER BY cohort, day_offset"""),
      doc = "cohort retention: users cohorted by first active day, distinct-counted " +
        "at day offsets 0/1/7/14 (integer day-index arithmetic)"),

    GQuery("agg_cube",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().cast("int").as("gid"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("gid"),
            col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
                     CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                     COUNT(*) AS n
              FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
              ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""),
      doc = "CUBE with grouping_id over all aggregation subsets"),

    // Winsorized robust statistics — the outlier-tolerant numeric-feature
    // prep a mix planner runs before averaging anything heavy-tailed:
    // values clipped to the exact rank-selected [p05, p95] (the
    // agg_percentiles convention — no interpolation), then aggregated
    // with the money-decimal convention (clip in double, SUM as
    // DECIMAL(18,2), one final double division) so the winsorized mean is
    // bit-exact cross-engine. ONE partition shuffle: the rank window, the
    // group-count window, and both bound-broadcast windows share the same
    // partitioning, and the final groupBy reuses it.
    GQuery("agg_winsorized",
      (s, dir) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        val wAll = Window.partitionBy(col("l_returnflag"))
        def bound(q: String, name: String) =
          max(when(col("rn") === expr(s"ceil($q * cnt)"), col("l_extendedprice")))
            .over(wAll).as(name)
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_extendedprice"),
            col("l_orderkey"), col("l_linenumber"))
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(wAll))
          .select(col("*"), bound("0.05", "p05"), bound("0.95", "p95"))
          .withColumn("clipped",
            least(greatest(col("l_extendedprice"), col("p05")), col("p95"))
              .cast("decimal(18,2)"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            max(col("p05")).as("p05"), max(col("p95")).as("p95"),
            count(when(col("l_extendedprice") < col("p05"), 1)).as("n_clipped_low"),
            count(when(col("l_extendedprice") > col("p95"), 1)).as("n_clipped_high"),
            sum(col("clipped")).cast("double").as("win_sum"))
          .withColumn("win_mean", col("win_sum") / col("n_rows"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH r AS (
                SELECT l_returnflag, l_extendedprice,
                       ROW_NUMBER() OVER (PARTITION BY l_returnflag
                         ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
                       COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
                FROM lineitem),
              b AS (
                SELECT *,
                       MAX(CASE WHEN rn = CEIL(0.05 * cnt) THEN l_extendedprice END)
                         OVER (PARTITION BY l_returnflag) AS p05,
                       MAX(CASE WHEN rn = CEIL(0.95 * cnt) THEN l_extendedprice END)
                         OVER (PARTITION BY l_returnflag) AS p95
                FROM r)
              SELECT l_returnflag,
                     count(*) AS n_rows,
                     MAX(p05) AS p05, MAX(p95) AS p95,
                     count(*) FILTER (WHERE l_extendedprice < p05) AS n_clipped_low,
                     count(*) FILTER (WHERE l_extendedprice > p95) AS n_clipped_high,
                     CAST(SUM(CAST(least(greatest(l_extendedprice, p05), p95)
                                   AS DECIMAL(18,2))) AS DOUBLE) AS win_sum,
                     CAST(SUM(CAST(least(greatest(l_extendedprice, p05), p95)
                                   AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS win_mean
              FROM b GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "winsorized robust stats: exact rank-selected [p05,p95] clip + " +
        "decimal-exact winsorized mean, one partition shuffle"),

    // Exact DISCRETE percentiles (value at rank ceil(q*n)) — no
    // interpolation arithmetic, so the picked values are raw column
    // doubles and hash-compare exactly; both engines evaluate the
    // identical ceil(q*n) rank formula.
    GQuery("agg_percentiles",
      (s, dir) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        val wAll = Window.partitionBy(col("l_returnflag"))
        def atQ(q: String, name: String) =
          max(when(col("rn") === expr(s"ceil($q * cnt)"), col("l_extendedprice"))).as(name)
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_extendedprice"),
            col("l_orderkey"), col("l_linenumber"))
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(wAll))
          .groupBy(col("l_returnflag"))
          .agg(atQ("0.25", "p25"), atQ("0.5", "p50"), atQ("0.75", "p75"),
            atQ("0.95", "p95"), max(col("cnt")).as("n_rows"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH r AS (
                SELECT l_returnflag, l_extendedprice,
                       ROW_NUMBER() OVER (PARTITION BY l_returnflag
                         ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
                       COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
                FROM lineitem)
              SELECT l_returnflag,
                     MAX(CASE WHEN rn = CEIL(0.25 * cnt) THEN l_extendedprice END) AS p25,
                     MAX(CASE WHEN rn = CEIL(0.5 * cnt) THEN l_extendedprice END) AS p50,
                     MAX(CASE WHEN rn = CEIL(0.75 * cnt) THEN l_extendedprice END) AS p75,
                     MAX(CASE WHEN rn = CEIL(0.95 * cnt) THEN l_extendedprice END) AS p95,
                     MAX(cnt) AS n_rows
              FROM r GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "exact discrete percentiles per group via rank selection (deterministic, interpolation-free)"),

    // The SCALE form of agg_percentiles: identical output, but computed
    // from a per-value histogram — the shuffle carries |distinct values|
    // rows per group instead of every row, and the cumulative window runs
    // over that histogram, not the data. (The value at rank ceil(q*n) is
    // exactly the smallest value whose cumulative count reaches the rank.)
    // The oracle is agg_percentiles' oracle verbatim: two plans, one truth.
    GQuery("agg_percentiles_hist",
      (s, dir) => {
        val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("l_returnflag"))
        def atQ(q: String, name: String) =
          min(when(col("cum") >= expr(s"ceil($q * n)"), col("l_extendedprice"))).as(name)
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_extendedprice"))
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(wCum))
          .withColumn("n", sum(col("c")).over(wAll))
          .groupBy(col("l_returnflag"))
          .agg(atQ("0.25", "p25"), atQ("0.5", "p50"), atQ("0.75", "p75"),
            atQ("0.95", "p95"), max(col("n")).as("n_rows"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH r AS (
                SELECT l_returnflag, l_extendedprice,
                       ROW_NUMBER() OVER (PARTITION BY l_returnflag
                         ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
                       COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
                FROM lineitem)
              SELECT l_returnflag,
                     MAX(CASE WHEN rn = CEIL(0.25 * cnt) THEN l_extendedprice END) AS p25,
                     MAX(CASE WHEN rn = CEIL(0.5 * cnt) THEN l_extendedprice END) AS p50,
                     MAX(CASE WHEN rn = CEIL(0.75 * cnt) THEN l_extendedprice END) AS p75,
                     MAX(CASE WHEN rn = CEIL(0.95 * cnt) THEN l_extendedprice END) AS p95,
                     MAX(cnt) AS n_rows
              FROM r GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "exact percentiles from a value histogram — same truth as agg_percentiles, scale-shaped plan"),

    // ---- SQL text API: the same engine drives spark.sql over temp views
    GQuery("sql_api_revenue",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
        Tables.orders(s, dir).createOrReplaceTempView("v_orders")
        Tables.customer(s, dir).createOrReplaceTempView("v_customer")
        s.sql("""
          SELECT c.c_mktsegment,
                 CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
                 COUNT(DISTINCT o.o_orderkey) AS n_orders
          FROM v_lineitem l
          JOIN v_orders o ON l.l_orderkey = o.o_orderkey
          JOIN v_customer c ON o.o_custkey = c.c_custkey
          WHERE o.o_orderpriority = '1-URGENT'
          GROUP BY c.c_mktsegment
          ORDER BY c.c_mktsegment""")
      },
      Some("""SELECT c.c_mktsegment,
                     CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
                     COUNT(DISTINCT o.o_orderkey) AS n_orders
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE o.o_orderpriority = '1-URGENT'
              GROUP BY c.c_mktsegment
              ORDER BY c.c_mktsegment"""),
      doc = "SQL text entry point (spark.sql over temp views), decimal-exact"),

    // ---- Spark 4 SQL session variables (DECLARE/SET VARIABLE): the
    // parameterized-query surface BI/orchestration layers template with —
    // the variable binds at execution, the PLAN is the literal's (the
    // oracle inlines it, proving result transparency).
    GQuery("sql_session_variable",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("v_orders_sqlvar")
        s.sql("DECLARE OR REPLACE VARIABLE graft_min_price DOUBLE")
        s.sql("SET VARIABLE graft_min_price = 150000.0")
        s.sql("""SELECT o_orderstatus, count(*) AS n_orders,
                        CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS total_cents
                 FROM v_orders_sqlvar WHERE o_totalprice >= graft_min_price
                 GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
                     CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS total_cents
              FROM orders WHERE o_totalprice >= 150000.0
              GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      doc = "SQL session variables (DECLARE/SET VARIABLE, Spark 4): " +
        "parameterized query == inlined-literal oracle"),

    // ---- Spark 4 SQL-defined scalar functions (CREATE FUNCTION ...
    // RETURN expr): the catalog-level UDF surface that stays INSIDE
    // codegen (the body inlines into the plan — no JVM closure, no
    // serialization wall), unlike Scala UDFs.
    GQuery("sql_udf_create",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("v_orders_sqludf")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_price_cents(p DOUBLE)
                 RETURNS BIGINT RETURN CAST(floor(p * 100) AS BIGINT)""")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_is_urgent(pr STRING)
                 RETURNS BOOLEAN RETURN pr IN ('1-URGENT', '2-HIGH')""")
        s.sql("""SELECT o_orderstatus,
                        count(*) AS n_urgent,
                        CAST(SUM(graft_price_cents(o_totalprice)) AS BIGINT)
                          AS urgent_cents
                 FROM v_orders_sqludf WHERE graft_is_urgent(o_orderpriority)
                 GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_urgent,
                     CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS urgent_cents
              FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
              GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      doc = "SQL-defined scalar functions (CREATE FUNCTION ... RETURN, " +
        "Spark 4): body inlines into codegen == inlined-expression oracle"),

    // ---- SQL pipe syntax (|>, Spark 4): the linear query form — each
    // stage reads top-down like the DataFrame API; same plan, same
    // results as the nested form the oracle runs.
    GQuery("sql_pipe_syntax",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("v_orders_pipe")
        s.sql("""FROM v_orders_pipe
                 |> WHERE o_orderstatus <> 'P'
                 |> EXTEND CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                 |> AGGREGATE count(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS total_cents
                    GROUP BY o_orderpriority
                 |> WHERE n_orders > 10
                 |> ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
                     CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS total_cents
              FROM orders WHERE o_orderstatus <> 'P'
              GROUP BY o_orderpriority HAVING count(*) > 10
              ORDER BY o_orderpriority"""),
      doc = "SQL pipe syntax (|> WHERE/EXTEND/AGGREGATE, Spark 4): the " +
        "linear top-down query form == nested-SQL oracle"),

    // ---- listagg (Spark 4 / ANSI): ordered string aggregation — the
    // report-surface aggregate (DuckDB: string_agg ORDER BY). Order is
    // pinned inside the aggregate, so the concatenation is deterministic.
    GQuery("agg_listagg",
      (s, dir) => {
        Tables.nation(s, dir).createOrReplaceTempView("v_nation_la")
        s.sql("""SELECT n_regionkey,
                        listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                          AS nations
                 FROM v_nation_la GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""SELECT n_regionkey,
                     string_agg(n_name, ',' ORDER BY n_name) AS nations
              FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),
      doc = "listagg WITHIN GROUP (Spark 4 ANSI ordered string " +
        "aggregation) == DuckDB string_agg ORDER BY"),

    // ---- GROUP BY ALL / ORDER BY ALL (Spark 4): the analyst-SQL
    // shorthand — grouping keys inferred as every non-aggregate select
    // item, ordering over the whole select list. Same plan as the
    // explicit form the oracle spells out; revenue summed in exact
    // cents (the float-sum determinism convention).
    GQuery("sql_group_by_all",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("v_orders_gba")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                        count(*) AS n_orders,
                        CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS revenue_cents
                 FROM v_orders_gba
                 GROUP BY ALL
                 ORDER BY ALL""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
                     CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
              FROM orders GROUP BY 1, 2 ORDER BY 1, 2, 3, 4"""),
      doc = "GROUP BY ALL + ORDER BY ALL (Spark 4 inferred grouping/" +
        "ordering) == explicit positional oracle, exact-cents revenue"),

    // ---- ANSI INTERVAL arithmetic (o25): year-month and day-time
    // interval literals composed on timestamps — month shift clamps to
    // month end identically in both engines, the 36-hour day-time arm
    // crosses day boundaries, and the timestamp difference is extracted
    // back out as whole days (day-time interval extraction). Rendered to
    // strings/integers so the compare is representation-stable.
    GQuery("o25_interval_arith",
      (s, dir) => Tables.orders(s, dir)
        .withColumn("due", col("o_orderdate")
          + expr("INTERVAL '2' MONTH") + expr("INTERVAL '10' DAY")
          + expr("INTERVAL '36' HOUR"))
        .withColumn("shift_days",
          expr("extract(DAY FROM (due - o_orderdate))").cast("long"))
        .groupBy(date_format(col("due"), "yyyy-MM").as("due_month"))
        .agg(count(lit(1)).as("n_orders"),
          date_format(min(col("due")), "yyyy-MM-dd HH:mm:ss").as("first_due"),
          date_format(max(col("due")), "yyyy-MM-dd HH:mm:ss").as("last_due"),
          sum(col("shift_days")).as("total_shift_days"))
        .orderBy(col("due_month")),
      Some("""WITH d AS (
                SELECT o_orderdate,
                       o_orderdate + INTERVAL 2 MONTH + INTERVAL 10 DAY
                         + INTERVAL 36 HOUR AS due
                FROM orders)
              SELECT strftime(due, '%Y-%m') AS due_month,
                     count(*) AS n_orders,
                     strftime(min(due), '%Y-%m-%d %H:%M:%S') AS first_due,
                     strftime(max(due), '%Y-%m-%d %H:%M:%S') AS last_due,
                     CAST(SUM(date_part('day', due - o_orderdate)) AS BIGINT)
                       AS total_shift_days
              FROM d GROUP BY 1 ORDER BY 1"""),
      doc = "ANSI interval arithmetic: year-month + day-time interval " +
        "composition on timestamps (month-end clamping, day-boundary " +
        "crossing) and day extraction from a timestamp difference, " +
        "censused per landing month"),

    // ---- As-of join (operator Spark lacks; composed per ops.AsOfJoin)
    GQuery("asof_last_signup",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("s_ts"),
            col("event_id").as("signup_event_id"))
        graft.ops.AsOfJoin.asOf(purchases, signups, Seq("user_id"),
            leftTs = "ts", rightTs = "s_ts",
            rightPayload = Seq("signup_event_id"))
          .select(col("event_id"), col("user_id"), col("signup_event_id"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, p.user_id, s.event_id AS signup_event_id
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
                ON p.user_id = s.user_id AND s.ts <= p.ts
              ORDER BY p.event_id"""),
      doc = "as-of join: latest signup at or before each purchase, per user"),

    // ---- As-of with TOLERANCE (pandas merge_asof's `tolerance`, the
    // production guard on every as-of API): the nearest backward match
    // still resolves, but matches older than 7 days are nulled — a
    // purchase "attributed" to a signup from two years ago is noise, not
    // attribution. Same one-shuffle as-of composition plus one CASE.
    GQuery("asof_tolerance",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("s_ts"),
            col("event_id").as("signup_event_id"))
        graft.ops.AsOfJoin.asOf(purchases, signups, Seq("user_id"),
            leftTs = "ts", rightTs = "s_ts",
            rightPayload = Seq("signup_event_id", "s_ts"))
          .select(col("event_id"), col("user_id"),
            when(expr("unix_micros(ts) - unix_micros(s_ts) <= 7 * 86400000000"),
              col("signup_event_id")).as("signup_within_7d"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, p.user_id,
                     CASE WHEN epoch_us(p.ts) - epoch_us(s.ts) <= 7 * 86400000000
                          THEN s.event_id END AS signup_within_7d
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
                ON p.user_id = s.user_id AND s.ts <= p.ts
              ORDER BY p.event_id"""),
      doc = "as-of join with a 7-day tolerance: stale nearest matches null out " +
        "(merge_asof tolerance semantics)"),

    // ---- FORWARD as-of: per view event, the user's NEXT purchase (at or
    // after the view) — next-touch attribution and per-event conversion
    // latency, the time-mirror of asof_last_signup. Census per view day:
    // views, converted views, exact-µs total wait (sum of bigints; the
    // one double division is avg at the end in the consumer, not here).
    GQuery("asof_next_purchase",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"),
            col("ts").as("purchase_ts"))
        graft.ops.AsOfJoin.asOfForward(views, purchases, Seq("user_id"),
            leftTs = "ts", rightTs = "p_ts",
            rightPayload = Seq("purchase_ts"))
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("view_day"))
          .agg(count(lit(1)).as("n_views"),
            count(col("purchase_ts")).as("n_converted"),
            sum(unix_micros(col("purchase_ts")) - unix_micros(col("ts")))
              .cast("long").as("total_wait_us"))
          .orderBy(col("view_day"))
      },
      Some("""WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
                   p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
                   nxt AS (
                     SELECT v.user_id, v.ts, min(p.ts) AS pts
                     FROM v LEFT JOIN p
                       ON p.user_id = v.user_id AND p.ts >= v.ts
                     GROUP BY v.user_id, v.ts)
              SELECT strftime(ts, '%Y-%m-%d') AS view_day,
                     count(*) AS n_views,
                     count(pts) AS n_converted,
                     CAST(SUM(epoch_us(pts) - epoch_us(ts)) AS BIGINT) AS total_wait_us
              FROM nxt GROUP BY 1 ORDER BY view_day"""),
      doc = "FORWARD as-of join: each view's next purchase (>= semantics), " +
        "exact-µs conversion-wait census per day"),

    // ---- Equi + range join: follow-up events within 1 hour of each purchase
    GQuery("range_join_followups",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
        val others = ev.select(col("event_id").as("f_id"), col("user_id").as("f_user"), col("ts").as("f_ts"))
        purchases.join(others,
            col("p_user") === col("f_user") &&
            col("f_ts") > col("p_ts") &&
            col("f_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"), "left")
          .groupBy(col("p_id"))
          .agg(count(col("f_id")).as("n_followups"))
          .orderBy(col("p_id"))
      },
      Some("""SELECT p.event_id AS p_id, count(f.event_id) AS n_followups
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              LEFT JOIN events f
                ON p.user_id = f.user_id
               AND f.ts > p.ts AND f.ts <= p.ts + INTERVAL 1 HOUR
              GROUP BY p.event_id
              ORDER BY p.event_id"""),
      doc = "equi+range join: per-purchase follow-up census within the hour"),

    // ---- INTERVAL OVERLAP join via the grid-bucket rewrite: per-(user,
    // day) activity intervals joined to non-aligned 3-hour maintenance
    // windows on `a.start < w.end AND w.start < a.end` — the variable-
    // length sibling of join_range_bucketed's fixed ±W band. Each interval
    // explodes into the 6-hour grid cells it COVERS (bounded: a day-capped
    // interval touches ≤ 5 cells), each window carries its one home cell,
    // the overlap becomes an equi-join on cell id + the exact residual,
    // and a window's cell-disjoint candidates never meet — bucket-local
    // work where Catalyst alone would plan a nested-loop product. Windows
    // sit INSIDE cells (offset 1h, length 3h) so the residual genuinely
    // filters; pairs meet in exactly one cell (the window's), so no dedup
    // pass is needed.
    GQuery("join_interval_overlap",
      (s, dir) => {
        val B = 21600000000L  // 6h grid, µs
        val a = Tables.events(s, dir)
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(min(expr("unix_micros(ts)")).as("s"),
            (max(expr("unix_micros(ts)")) + 1).as("e"))
        val maxK = a.agg((max(col("e")) / lit(B)).cast("long").as("max_k"))
        val w = maxK.select(explode(expr("sequence(0, max_k)")).as("k"))
          .filter(col("k") % 2 === 1)
          .select(col("k"), (col("k") * B + 3600000000L).as("ws"),
            (col("k") * B + 14400000000L).as("we"))
        val covered = a.withColumn("k",
          explode(expr(s"sequence(s div $B, (e - 1) div $B)")))
        covered.join(w, Seq("k"))
          .filter(col("s") < col("we") && col("ws") < col("e"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_intervals"),
            countDistinct(col("user_id")).as("n_users"))
          .select(
            date_format(expr("timestamp_seconds(k * 21600 + 3600)"),
              "yyyy-MM-dd HH:mm").as("window_start"),
            col("n_intervals"), col("n_users"))
          .orderBy(col("window_start"))
      },
      Some("""WITH a AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                       min(epoch_us(ts)) AS s, max(epoch_us(ts)) + 1 AS e
                FROM events GROUP BY 1, 2),
              mk AS (SELECT CAST(max(e) // 21600000000 AS BIGINT) AS max_k FROM a),
              k AS (SELECT unnest(range(0, (SELECT max_k + 1 FROM mk))) AS k),
              w AS (SELECT k, k * 21600000000 + 3600000000 AS ws,
                           k * 21600000000 + 14400000000 AS we
                    FROM k WHERE k % 2 = 1),
              ov AS (SELECT w.k, a.user_id
                     FROM a JOIN w ON a.s < w.we AND w.ws < a.e)
              SELECT strftime(to_timestamp(k * 21600 + 3600), '%Y-%m-%d %H:%M')
                       AS window_start,
                     count(*) AS n_intervals,
                     count(DISTINCT user_id) AS n_users
              FROM ov GROUP BY k ORDER BY window_start"""),
      doc = "interval-overlap join via grid-cell explode + equi-join + exact " +
        "residual (bounded cover, no dedup pass) == quadratic overlap oracle"),

    // ---- Pure-temporal range join, NO equi key — the case Catalyst can
    // only plan as a nested-loop product. The bucketed rewrite: each left
    // row explodes into its ±60s bucket and both neighbors, the right side
    // carries its single bucket, and the range condition becomes an
    // EQUI-join on the bucket id plus a residual |Δus| filter. Work is
    // bucket-local (expected rows-per-bucket × 3 probes), never all-pairs;
    // a matching pair's bucket ids differ by at most 1, so exactly one of
    // the three probes hits — no dedup pass needed. This is the standard
    // range-join optimization large engines apply, expressed in plain
    // DataFrame algebra.
    GQuery("join_range_bucketed",
      (s, dir) => {
        val W = 60000000L   // ±60 s in µs == the bucket width
        val ev = Tables.events(s, dir)
          .select(col("event_id"), unix_micros(col("ts")).as("us"))
        val probe = ev
          .withColumn("bkt", expr(s"CAST(floor(us / ${W}D) AS BIGINT)"))
          .withColumn("b", explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)))
          .drop("bkt")
        val build = ev
          .select(col("event_id").as("e2"), col("us").as("us2"))
          .withColumn("b", expr(s"CAST(floor(us2 / ${W}D) AS BIGINT)"))
        probe.join(build, Seq("b"))
          .filter(col("event_id") =!= col("e2") &&
            abs(col("us2") - col("us")) <= W)
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_neighbors"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT a.event_id, count(*) AS n_neighbors
              FROM events a JOIN events b
                ON a.event_id <> b.event_id
               AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= CAST(60000000 AS BIGINT)
              GROUP BY a.event_id
              ORDER BY a.event_id"""),
      doc = "no-equi-key range join via the bucketed rewrite: temporal neighbors " +
        "within 60s corpus-wide, bucket equi-join + residual, never all-pairs"),

    // ---- Approximate distinct via deterministic KMV sketch (ops.Sketch)
    GQuery("kmv_distinct_users",
      (s, dir) => graft.ops.Sketch.kmvDistinct(
          Tables.events(s, dir), Seq("event_type"), "user_id", k = 64)
        .orderBy(col("event_type")),
      Some("""WITH hashed AS (
                SELECT DISTINCT event_type, user_id,
                       CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
                FROM events),
              ranked AS (
                SELECT event_type, h,
                       ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
                FROM hashed),
              kth AS (
                SELECT event_type,
                       max(CASE WHEN r = 64 THEN h END) AS kth_min_hash,
                       count(*) AS exact
                FROM ranked GROUP BY 1)
              SELECT event_type, kth_min_hash, exact,
                     CASE WHEN kth_min_hash IS NULL THEN CAST(exact AS DOUBLE)
                          ELSE 63.0 / (kth_min_hash / POWER(2.0, 60)) END AS estimate
              FROM kth ORDER BY event_type"""),
      doc = "KMV distinct-count sketch: mergeable O(k) summary, estimate reproducible by the oracle"),

    // The single-pass production form of the same sketch: a bounded
    // Aggregator buffer (k longs per group per map partition through the
    // shuffle) instead of the rank window's whole-group sort. Same oracle
    // arithmetic — estimates hash-match the window form's.
    GQuery("kmv_distinct_users_agg",
      (s, dir) => {
        import s.implicits._
        import graft.functions.KmvAggregator
        Tables.events(s, dir)
          .select(col("event_type"), expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
          .as[(String, Long)]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(KmvAggregator.kmv(64).toColumn)
          .map { case (t, out) => (t, out.kth_min_hash, out.estimate) }
          .toDF("event_type", "kth_min_hash", "estimate")
          .orderBy(col("event_type"))
      },
      Some("""WITH hashed AS (
                SELECT DISTINCT event_type, user_id,
                       CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
                FROM events),
              ranked AS (
                SELECT event_type, h,
                       ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
                FROM hashed),
              kth AS (
                SELECT event_type,
                       max(CASE WHEN r = 64 THEN h END) AS kth_min_hash,
                       count(*) AS exact
                FROM ranked GROUP BY 1)
              SELECT event_type, kth_min_hash,
                     CASE WHEN kth_min_hash IS NULL THEN CAST(exact AS DOUBLE)
                          ELSE 63.0 / (kth_min_hash / POWER(2.0, 60)) END AS estimate
              FROM kth ORDER BY event_type"""),
      doc = "single-pass bounded-buffer KMV (Aggregator) == the window-form sketch"),

    // ---- Count-Min Sketch: bounded-memory frequency estimates; md5-derived
    // buckets make the whole counter matrix integer-reproducible in DuckDB
    GQuery("sketch_cms_user_freq",
      (s, dir) => {
        import s.implicits._
        import graft.functions.CmsAggregator
        val d = 4; val w = 256
        val events = Tables.events(s, dir)
        val sketchDf = events.select(col("user_id")).as[Long]
          .select(CmsAggregator.cms(d, w).toColumn)
          .toDF("sketch")
        val truth = events.filter(col("user_id") < 40)
          .groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
        truth.crossJoin(broadcast(sketchDf))
          .withColumn("cms_est", expr(
            s"""array_min(transform(sequence(0, ${d - 1}),
               |  i -> sketch[CAST(i AS INT) * $w +
               |    CAST(CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % $w AS INT)]))""".stripMargin))
          .select(col("user_id"), col("true_cnt"), col("cms_est"))
          .orderBy(col("user_id"))
      },
      Some("""WITH rows_ AS (SELECT unnest(range(0, 4)) AS i),
                   hashed AS (
                     SELECT r.i,
                            CAST('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)), 1, 15) AS BIGINT) % 256 AS b
                     FROM events e, rows_ r),
                   counters AS (SELECT i, b, count(*) AS c FROM hashed GROUP BY 1, 2),
                   truth AS (SELECT user_id, count(*) AS true_cnt
                             FROM events WHERE user_id < 40 GROUP BY 1),
                   probe AS (
                     SELECT t.user_id, t.true_cnt, r.i,
                            CAST('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || CAST(t.user_id AS VARCHAR)), 1, 15) AS BIGINT) % 256 AS b
                     FROM truth t, rows_ r)
              SELECT p.user_id, p.true_cnt,
                     CAST(min(COALESCE(c.c, 0)) AS BIGINT) AS cms_est
              FROM probe p LEFT JOIN counters c ON c.i = p.i AND c.b = p.b
              GROUP BY p.user_id, p.true_cnt
              ORDER BY p.user_id"""),
      doc = "Count-Min Sketch point-frequency estimates (mergeable d x w counter Aggregator) vs true counts"),

    // ---- Set operations (SURVEY.md §2.6: union/intersect/except for merge rewrites)
    GQuery("set_ops",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val high = o.filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
        val y94 = o.filter(year(col("o_orderdate")) === 1994).select(col("o_orderkey"))
        high.union(y94).distinct().select(lit("union").as("kind"), col("o_orderkey"))
          .unionByName(high.intersect(y94).select(lit("intersect").as("kind"), col("o_orderkey")))
          .unionByName(high.except(y94).select(lit("except").as("kind"), col("o_orderkey")))
          .orderBy(col("kind"), col("o_orderkey"))
      },
      Some("""WITH high AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000),
                   y94 AS (SELECT o_orderkey FROM orders WHERE year(o_orderdate) = 1994)
              SELECT 'union' AS kind, o_orderkey FROM (SELECT o_orderkey FROM high UNION SELECT o_orderkey FROM y94)
              UNION ALL
              SELECT 'intersect' AS kind, o_orderkey FROM (SELECT o_orderkey FROM high INTERSECT SELECT o_orderkey FROM y94)
              UNION ALL
              SELECT 'except' AS kind, o_orderkey FROM (SELECT o_orderkey FROM high EXCEPT SELECT o_orderkey FROM y94)
              ORDER BY kind, o_orderkey"""),
      doc = "UNION / INTERSECT / EXCEPT in one tagged result"),

    // ---- ExistenceJoin: an IN-subquery under OR cannot become a plain
    // semi-join (the other disjunct must still pass rows), so the engine
    // plans the marker-column existence join — the join TYPE the
    // semi/anti pair doesn't cover.
    GQuery("join_existence",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("v_ord_ex")
        Tables.customer(s, dir).createOrReplaceTempView("v_cust_ex")
        s.sql("""
          SELECT o_orderstatus AS status, count(*) AS n_orders
          FROM v_ord_ex o
          WHERE o.o_custkey IN (SELECT c_custkey FROM v_cust_ex
                                WHERE c_acctbal > 9000)
             OR o.o_totalprice > 400000
          GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus AS status, count(*) AS n_orders
              FROM orders o
              WHERE o.o_custkey IN (SELECT c_custkey FROM customer
                                    WHERE c_acctbal > 9000)
                 OR o.o_totalprice > 400000
              GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      doc = "existence join (IN-subquery under OR): marker-column join type, " +
        "irreducible to semi/anti"),

    // ---- Market-basket frequent pairs (the distributed A-priori step):
    // baskets = each customer's distinct clerk set; candidate pairs are
    // generated ONLY within a basket (per-customer self-join on a
    // bounded-size set — never clerks × clerks), then support-filtered.
    // At 100 TB the basket-local generation is what keeps candidate count
    // Σ|basket|² instead of |items|².
    GQuery("agg_frequent_pairs",
      (s, dir) => {
        val b = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
        val l = b.withColumnRenamed("l_suppkey", "s1")
        val r = b.withColumnRenamed("l_suppkey", "s2")
        l.join(r, Seq("l_orderkey")).filter(col("s1") < col("s2"))
          .groupBy(col("s1"), col("s2"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 3)
          .orderBy(col("s1"), col("s2"))
      },
      Some("""WITH b AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
              SELECT l.l_suppkey AS s1, r.l_suppkey AS s2, count(*) AS support
              FROM b l JOIN b r
                ON l.l_orderkey = r.l_orderkey AND l.l_suppkey < r.l_suppkey
              GROUP BY 1, 2 HAVING count(*) >= 3
              ORDER BY s1, s2"""),
      doc = "frequent supplier pairs co-occurring in orders (basket-local " +
        "candidate generation + support floor — the A-priori join step)"),

    // ---- Pearson correlation from EXACT integer moments: n, Σx, Σy, Σxy,
    // Σx², Σy² accumulate as DECIMAL(38,0) (order-independent integer
    // sums), and r is derived by a fixed five-op IEEE expression (two
    // correctly-rounded subtractions-products inside casts, one sqrt, one
    // multiply, one divide) — the statistical aggregate family without the
    // engine's float-accumulating corr(), which no oracle can match.
    GQuery("agg_pearson_exact",
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          floor(col("l_quantity")).cast("decimal(18,0)").as("x"),
          floor(col("l_extendedprice")).cast("decimal(18,0)").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("l_returnflag"),
          col("n").cast("long").as("n_rows"),
          col("sx").cast("long").as("sum_x"), col("sy").cast("long").as("sum_y"),
          expr("CAST(n * sxy - sx * sy AS DOUBLE) " +
            "/ (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) " +
            "* sqrt(CAST(n * syy - sy * sy AS DOUBLE)))").as("pearson_r"))
        .orderBy(col("l_returnflag")),
      Some("""WITH t AS (
                SELECT l_returnflag,
                       CAST(floor(l_quantity) AS HUGEINT) AS x,
                       CAST(floor(l_extendedprice) AS HUGEINT) AS y
                FROM lineitem),
              m AS (
                SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
                       SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                       SUM(x * x) AS sxx, SUM(y * y) AS syy
                FROM t GROUP BY l_returnflag)
              SELECT l_returnflag,
                     CAST(n AS BIGINT) AS n_rows,
                     CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
                     CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS pearson_r
              FROM m ORDER BY l_returnflag"""),
      doc = "Pearson r per group from exact integer moments (decimal sums, " +
        "five correctly-rounded IEEE ops) — deterministic where native corr() " +
        "is accumulation-order-dependent"),

    // ---- A5+: the argmax aggregate family — max_by/min_by (keyed on the
    // UNIQUE custkey so the pick is well-defined; ties in these functions
    // are engine-private), count_if, bool_and/bool_or. The breadth row of
    // §2.4 beyond sums and counts.
    GQuery("a5_argmax_aggregates",
      (s, dir) => Tables.customer(s, dir)
        .groupBy(col("c_nationkey"))
        .agg(expr("max_by(c_name, c_custkey)").as("last_customer"),
          expr("min_by(c_name, c_custkey)").as("first_customer"),
          expr("count_if(c_acctbal > 0)").as("n_positive"),
          expr("bool_and(c_acctbal > -1000)").as("all_above_floor"),
          expr("bool_or(c_acctbal > 9000)").as("any_rich"))
        .orderBy(col("c_nationkey")),
      Some("""SELECT c_nationkey,
                     arg_max(c_name, c_custkey) AS last_customer,
                     arg_min(c_name, c_custkey) AS first_customer,
                     CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_positive,
                     bool_and(c_acctbal > -1000) AS all_above_floor,
                     bool_or(c_acctbal > 9000) AS any_rich
              FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""),
      doc = "argmax aggregate family: max_by/min_by on a unique key, count_if, " +
        "bool_and/bool_or per nation"),

    // ---- NULL-safe equality JOIN: `<=>` as the join key matches the NULL
    // bucket with the NULL dim row — the semantics a plain equi-join
    // silently drops (NULL = NULL is NULL, so those rows vanish). The
    // label census proves the null bucket survives the join.
    GQuery("join_null_safe",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val facts = o.select(expr("nullif(o_custkey % 10, 3)").as("k"),
          col("o_orderkey"))
        val dim = o.select(expr("nullif(o_custkey % 10, 3)").as("dk")).distinct()
          .withColumn("bucket_label",
            concat(lit("b"), coalesce(col("dk").cast("string"), lit("null"))))
        facts.join(dim, facts("k") <=> dim("dk"))
          .groupBy(col("bucket_label"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("bucket_label"))
      },
      Some("""WITH facts AS (SELECT nullif(o_custkey % 10, 3) AS k, o_orderkey
                             FROM orders),
                   dim AS (SELECT DISTINCT nullif(o_custkey % 10, 3) AS dk
                           FROM orders),
                   d2 AS (SELECT dk, 'b' || COALESCE(CAST(dk AS VARCHAR), 'null')
                                      AS bucket_label FROM dim)
              SELECT bucket_label, count(*) AS n_orders
              FROM facts JOIN d2 ON facts.k IS NOT DISTINCT FROM d2.dk
              GROUP BY bucket_label ORDER BY bucket_label"""),
      doc = "null-safe <=> join key: the NULL bucket matches its NULL dim row " +
        "instead of vanishing; label census per bucket"),

    // ---- BAG (ALL) set semantics: INTERSECT ALL keeps min(multiplicity),
    // EXCEPT ALL subtracts multiplicities — the multiset laws the DISTINCT
    // forms above erase, checked over two supplier-key bags with real
    // duplicate counts. Census keeps the output bounded.
    GQuery("set_ops_all",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val a = li.filter(col("l_orderkey") % 2 === 0).select(col("l_suppkey"))
        val b = li.filter(col("l_orderkey") % 2 === 1).select(col("l_suppkey"))
        a.intersectAll(b).select(lit("intersect_all").as("kind"), col("l_suppkey"))
          .unionByName(a.exceptAll(b).select(lit("except_all").as("kind"), col("l_suppkey")))
          .groupBy(col("kind"), col("l_suppkey"))
          .agg(count(lit(1)).as("n_copies"))
          .orderBy(col("kind"), col("l_suppkey"))
      },
      Some("""WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_orderkey % 2 = 0),
                   b AS (SELECT l_suppkey FROM lineitem WHERE l_orderkey % 2 = 1),
                   u AS (
                     SELECT 'intersect_all' AS kind, l_suppkey
                     FROM (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM b)
                     UNION ALL
                     SELECT 'except_all' AS kind, l_suppkey
                     FROM (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM b))
              SELECT kind, l_suppkey, count(*) AS n_copies
              FROM u GROUP BY kind, l_suppkey
              ORDER BY kind, l_suppkey"""),
      doc = "INTERSECT ALL / EXCEPT ALL multiset semantics (min / subtracted " +
        "multiplicities) censused per key"),

    // ---- GROUPING SETS: the general form cube/rollup specialize. Emitting
    // the grouping id makes every output row unambiguous (a NULL key from
    // the data vs. a NULL from aggregation level), and the explicit
    // NULLS FIRST order matches both engines.
    GQuery("agg_grouping_sets",
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("events_gs")
        s.sql("""SELECT event_type, CAST(year(ts) AS INT) AS event_year,
                        CAST(grouping(event_type) * 2 + grouping(year(ts)) AS INT) AS gid,
                        COUNT(*) AS n,
                        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
                 FROM events_gs
                 GROUP BY GROUPING SETS ((event_type, year(ts)), (event_type), ())
                 ORDER BY gid, event_type ASC NULLS FIRST, event_year ASC NULLS FIRST""")
      },
      Some("""SELECT event_type, CAST(year(ts) AS INT) AS event_year,
                     CAST(grouping(event_type) * 2 + grouping(year(ts)) AS INT) AS gid,
                     COUNT(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM events
              GROUP BY GROUPING SETS ((event_type, year(ts)), (event_type), ())
              ORDER BY gid, event_type ASC NULLS FIRST, event_year ASC NULLS FIRST"""),
      doc = "GROUPING SETS with grouping-id disambiguation (general form of cube/rollup)"),

    // ---- Full outer join: both unmatched sides survive with null-safe
    // output (customers who never produced events AND event users outside
    // the customer dim).
    GQuery("join_full_outer",
      (s, dir) => {
        val perUser = Tables.events(s, dir)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"))
          .join(perUser, col("c_custkey") === col("user_id"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("user_id")).as("uid"),
            col("c_custkey").isNotNull.as("has_customer"),
            coalesce(col("n_events"), lit(0L)).as("n_events"))
          .orderBy(col("uid"))
      },
      Some("""SELECT COALESCE(c_custkey, user_id) AS uid,
                     c_custkey IS NOT NULL AS has_customer,
                     COALESCE(n_events, 0) AS n_events
              FROM customer
              FULL OUTER JOIN (SELECT user_id, COUNT(*) AS n_events
                               FROM events GROUP BY user_id) e
                ON c_custkey = user_id
              ORDER BY uid"""),
      doc = "FULL OUTER JOIN with null-safe projection (both unmatched sides kept)"),

    // ---- Time-series resample + gap fill: per-user daily calendar spine
    // (sequence over the user's [min,max] day range), left-joined activity,
    // LOCF forward fill via last(ignoreNulls) — the standard "regularize an
    // irregular series" op a feature pipeline runs before any rolling
    // computation. Census output (per-user day/gap/fill totals) keeps the
    // result |users|-bounded while still proving every filled value.
    // Scale: the day agg and both windows partition by user_id — the spine
    // explode is |user| x |day range| rows but never concentrates; integer
    // counts only (no float sums), so the fill total hash-compares.
    GQuery("ts_gapfill",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byDay = Tables.events(s, dir)
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("n_events"))
        val spine = byDay.groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(byDay, Seq("user_id", "day"), "left")
          .withColumn("filled_n", last(col("n_events"), ignoreNulls = true).over(w))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_days"),
            count(col("n_events")).as("n_active_days"),
            count(when(col("n_events").isNull, 1)).as("n_gap_days"),
            coalesce(sum(when(col("n_events").isNull, col("filled_n"))), lit(0L))
              .as("filled_gap_total"))
          .orderBy(col("user_id"))
      },
      Some("""WITH byday AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                       count(*) AS n_events
                FROM events GROUP BY 1, 2),
              spine AS (
                SELECT user_id, unnest(generate_series(min(day), max(day))) AS day
                FROM byday GROUP BY user_id),
              f AS (
                SELECT s.user_id, s.day, b.n_events,
                       last_value(b.n_events IGNORE NULLS) OVER (
                         PARTITION BY s.user_id ORDER BY s.day
                         ROWS UNBOUNDED PRECEDING) AS filled_n
                FROM spine s LEFT JOIN byday b
                  ON s.user_id = b.user_id AND s.day = b.day)
              SELECT user_id,
                     count(*) AS n_days,
                     count(n_events) AS n_active_days,
                     CAST(count(*) FILTER (n_events IS NULL) AS BIGINT) AS n_gap_days,
                     CAST(COALESCE(SUM(CASE WHEN n_events IS NULL THEN filled_n END), 0)
                          AS BIGINT) AS filled_gap_total
              FROM f GROUP BY user_id ORDER BY user_id"""),
      doc = "time-series resample + LOCF gap fill: per-user daily spine, " +
        "forward-filled activity, |users|-bounded census of days/gaps/fills"),

    // ---- Pareto frontier (skyline) over (order date, total price), both
    // maximized: the multi-criteria "best documents" selection a curation
    // pipeline runs (quality x recency here stood in by price x date). The
    // naive form is an all-pairs NOT EXISTS — O(n^2) and impossible at
    // corpus scale. This is the standard prune-then-verify rewrite: a
    // per-day max-price table (bounded: |distinct days| rows) takes one
    // tiny reverse-cumulative window; any order whose price <= the max of
    // a strictly later day is dominated by that day's argmax (its date is
    // strictly greater), so the broadcast prune kills ~all of the corpus.
    // True skyline points can never be pruned (no later-or-equal-day order
    // with >= price exists for them), and every dominated survivor is
    // dominated by some maximal survivor (dominance is a finite strict
    // partial order), so the exact pairwise verify runs only on the
    // bounded candidate set. DATA-SHAPE ASSUMPTION: the prune is effective
    // when per-day maxima are not monotonically decreasing over days — on
    // independent price/date data (this corpus, any realistic one)
    // survivors ~ O(skyline); an adversarial corpus where every later day
    // is strictly cheaper keeps O(n) candidates and the broadcast verify
    // degrades — such data needs the sort-based sweep (one global sort by
    // d desc + running cummax filter), not this rewrite.
    GQuery("agg_skyline",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.orders(s, dir).select(col("o_orderkey"),
          expr("unix_micros(o_orderdate) div 86400000000").as("d"),
          col("o_totalprice"))
        val days = o.groupBy(col("d")).agg(max(col("o_totalprice")).as("pmax"))
        val wRev = Window.orderBy(col("d").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val cm = days
          .withColumn("later_max", max(col("pmax")).over(wRev))
          .select(col("d"), col("later_max"))
        val cand = o.join(broadcast(cm), Seq("d"))
          .filter(col("later_max").isNull || col("o_totalprice") > col("later_max"))
          .drop("later_max")
        val c2 = cand.select(col("d").as("d2"), col("o_totalprice").as("p2"))
        cand.join(broadcast(c2),
            col("p2") >= col("o_totalprice") && col("d2") >= col("d") &&
              (col("p2") > col("o_totalprice") || col("d2") > col("d")), "left_anti")
          .select(col("o_orderkey"), col("d"), col("o_totalprice"))
          .orderBy(col("d"), col("o_orderkey"))
      },
      Some("""WITH o AS (SELECT o_orderkey,
                                epoch_us(o_orderdate) // 86400000000 AS d,
                                o_totalprice
                         FROM orders)
              SELECT o_orderkey, d, o_totalprice
              FROM o
              WHERE NOT EXISTS (
                SELECT 1 FROM o o2
                WHERE o2.o_totalprice >= o.o_totalprice AND o2.d >= o.d
                  AND (o2.o_totalprice > o.o_totalprice OR o2.d > o.d))
              ORDER BY d, o_orderkey"""),
      doc = "Pareto frontier (skyline) on date x price via prune-then-verify: " +
        "bounded per-day reverse-cummax prune, exact pairwise only on survivors " +
        "(oracle runs the quadratic NOT EXISTS form)"),

    // ---- Gaps-and-islands: longest consecutive-day activity streak per
    // user — the discrete-calendar sibling of time-gap sessionization
    // (sessionization groups by elapsed time; this groups by the classic
    // day-minus-row_number island key). Both windows and the run agg
    // partition by user_id; ties resolved deterministically (longest, then
    // earliest start) so the pick hash-compares.
    GQuery("w6_streaks",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val days = Tables.events(s, dir)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val wU = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val runs = days.withColumn("grp", col("day") - row_number().over(wU))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).cast("int").as("streak_len"),
            min(col("day")).as("start_day"), max(col("day")).as("end_day"))
        val pick = Window.partitionBy(col("user_id"))
          .orderBy(col("streak_len").desc, col("start_day"))
        runs.withColumn("rn", row_number().over(pick)).filter(col("rn") === 1)
          .select(col("user_id"), col("streak_len"),
            col("start_day"), col("end_day"))
          .orderBy(col("user_id"))
      },
      Some("""WITH d AS (SELECT DISTINCT user_id,
                                epoch_us(ts) // 86400000000 AS day
                         FROM events),
                   r AS (SELECT user_id, day,
                                day - row_number() OVER (
                                  PARTITION BY user_id ORDER BY day) AS grp
                         FROM d),
                   s AS (SELECT user_id, CAST(count(*) AS INT) AS streak_len,
                                min(day) AS start_day, max(day) AS end_day
                         FROM r GROUP BY user_id, grp)
              SELECT user_id, streak_len, start_day, end_day
              FROM s
              QUALIFY row_number() OVER (PARTITION BY user_id
                        ORDER BY streak_len DESC, start_day) = 1
              ORDER BY user_id"""),
      doc = "gaps-and-islands longest consecutive-day streak per user " +
        "(day-minus-row_number island key, deterministic tie-break)"),

    // ---- Time-weighted average over an irregular series: each event's
    // value held (LOCF) until the next event, weighted by the held
    // duration — the telemetry/finance aggregate a plain AVG gets wrong
    // (it overweights bursts). Everything integral: cents x whole seconds
    // accumulate as exact bigint sums, one final integer division — so
    // TWAP hash-compares where a float formulation couldn't (corpus values
    // are positive; Spark `div` and DuckDB `//` agree on non-negatives).
    // One window + one agg, both partitioned by user_id.
    GQuery("ts_twap",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val e = Tables.events(s, dir).select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("us"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
        e.withColumn("next_us", lead(col("us"), 1).over(w))
          .filter(col("next_us").isNotNull)
          .withColumn("dt_s", expr("(next_us - us) div 1000000"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("dt_s")).as("duration_s"),
            sum(col("cents") * col("dt_s")).as("weighted_cents_s"))
          .filter(col("duration_s") > 0)
          .withColumn("twap_cents", expr("weighted_cents_s div duration_s"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                                CAST(floor(value * 100) AS BIGINT) AS cents
                         FROM events),
                   iv AS (SELECT user_id, cents, us,
                                 lead(us) OVER (PARTITION BY user_id
                                                ORDER BY us, event_id) AS next_us
                          FROM e),
                   d AS (SELECT user_id, cents, (next_us - us) // 1000000 AS dt_s
                         FROM iv WHERE next_us IS NOT NULL),
                   g AS (SELECT user_id, count(*) AS n_intervals,
                                CAST(SUM(dt_s) AS BIGINT) AS duration_s,
                                CAST(SUM(cents * dt_s) AS BIGINT) AS weighted_cents_s
                         FROM d GROUP BY user_id)
              SELECT user_id, n_intervals, duration_s, weighted_cents_s,
                     weighted_cents_s // duration_s AS twap_cents
              FROM g WHERE duration_s > 0 ORDER BY user_id"""),
      doc = "time-weighted average (LOCF value x held duration) per user: exact " +
        "integer cents x seconds sums, one final integer division"),

    // ---- Exponentially-weighted moving average over each user's daily
    // series, the smoothing a telemetry/quality monitor tracks. α = 1/2
    // on purpose: every step is s := (s + x)/2 — one IEEE add and one
    // EXACT halving — evaluated as the identical left fold in both
    // engines (Spark `aggregate` HOF with first-element init == DuckDB
    // `list_reduce`), so the result hash-compares where a generic-α
    // closed form (libm pow, engine-ordered summation) could not. Scale
    // shape: one map-side-combined daily aggregate, then per-user BOUNDED
    // day lists (≤ 31 here; a year is still bounded) folded per row — no
    // window, no cross-user state.
    GQuery("ts_ewma",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
        daily.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_days"),
            expr("sort_array(collect_list(struct(d, cents)))").as("xs"))
          .withColumn("vals", expr("transform(xs, x -> CAST(x.cents AS DOUBLE))"))
          .withColumn("ewma_cents", expr(
            "aggregate(slice(vals, 2, size(vals) - 1), vals[0], (s, x) -> (s + x) / 2D)"))
          .select(col("user_id"), col("n_days"), col("ewma_cents"))
          .orderBy(col("user_id"))
      },
      Some("""WITH daily AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
                FROM events GROUP BY 1, 2),
              agg AS (
                SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
                       list(CAST(cents AS DOUBLE) ORDER BY d) AS vals
                FROM daily GROUP BY user_id)
              SELECT user_id, n_days,
                     list_reduce(vals, (s, x) -> (s + x) / 2) AS ewma_cents
              FROM agg ORDER BY user_id"""),
      doc = "per-user daily EWMA with alpha=1/2: identical left fold (one add + " +
        "exact halving per step) in both engines — deterministic smoothing"),

    // ---- Holt double exponential smoothing (level + trend) per event
    // type — ts_ewma's two-state sibling. α=β=1/2 keeps every recurrence
    // one add + one exact halving (IEEE-exact, identically ordered), and
    // the PAIR state rides the list-encoded-fold trick: Spark aggregate()
    // takes an array<double> [level, trend, sse] accumulator directly;
    // DuckDB's list_reduce needs acc type == element type, so values are
    // wrapped [v] and the init list-prepended — the ts_ewma parity
    // contract extended to vector state. In-sample one-step SSE and the
    // 3-step-ahead forecast come from the same fold. Bounded day lists
    // (≤31; a year is still bounded) folded per row — no window.
    GQuery("ts_holt_trend",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
        daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            expr("sort_array(collect_list(struct(d, cents)))").as("xs"))
          .filter(size(col("xs")) >= 2)
          .withColumn("vals", expr("transform(xs, x -> CAST(x.cents AS DOUBLE))"))
          .withColumn("st", expr(
            """aggregate(slice(vals, 3, size(vals) - 2),
              |  array(element_at(vals, 2),
              |        element_at(vals, 2) - element_at(vals, 1),
              |        CAST(0.0 AS DOUBLE)),
              |  (acc, x) -> array(
              |    (x + (element_at(acc, 1) + element_at(acc, 2))) / 2D,
              |    (((x + (element_at(acc, 1) + element_at(acc, 2))) / 2D
              |       - element_at(acc, 1)) + element_at(acc, 2)) / 2D,
              |    element_at(acc, 3)
              |      + ((element_at(acc, 1) + element_at(acc, 2)) - x)
              |        * ((element_at(acc, 1) + element_at(acc, 2)) - x)))""".stripMargin))
          .select(col("event_type"), col("n_days"),
            expr("element_at(st, 1)").as("level"),
            expr("element_at(st, 2)").as("trend"),
            expr("element_at(st, 1) + 3D * element_at(st, 2)").as("forecast_3"),
            expr("element_at(st, 3)").as("sse"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
                SELECT event_type, epoch_us(ts) // 86400000000 AS d,
                       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
                FROM events GROUP BY 1, 2),
              agg AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                       list(CAST(cents AS DOUBLE) ORDER BY d) AS vals
                FROM daily GROUP BY event_type),
              folded AS (
                SELECT event_type, n_days,
                       list_reduce(
                         list_prepend([vals[2], vals[2] - vals[1], CAST(0.0 AS DOUBLE)],
                           list_transform(vals[3:], v -> [v, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
                         (acc, x) -> [
                           (x[1] + (acc[1] + acc[2])) / 2,
                           (((x[1] + (acc[1] + acc[2])) / 2 - acc[1]) + acc[2]) / 2,
                           acc[3] + ((acc[1] + acc[2]) - x[1]) * ((acc[1] + acc[2]) - x[1])]) AS st
                FROM agg WHERE len(vals) >= 2)
              SELECT event_type, n_days,
                     st[1] AS level, st[2] AS trend,
                     st[1] + 3 * st[2] AS forecast_3,
                     st[3] AS sse
              FROM folded ORDER BY event_type"""),
      doc = "Holt level+trend smoothing (alpha=beta=1/2 exact halvings) per " +
        "event type: identical vector-state left fold in both engines, " +
        "one-step in-sample SSE + 3-step forecast from the same pass"),

    // ---- CUSUM changepoint statistic per event type: Page's test
    // computed NOT as a sequential fold but via the exact prefix-sum
    // identity S+_t = C_t − min_{0≤j≤t} C_j (and mirrored for S−), where
    // C is the running sum of (cents − target). That turns the stateful
    // recurrence into two plain cumulative windows partitioned by type —
    // shuffle-free beyond one type-keyed exchange, exact integers
    // throughout, and the identity (not the engine's fold order) is the
    // cross-engine contract. Target = per-type mean floor; alarm when
    // either side exceeds it.
    GQuery("ts_cusum",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
        val target = daily.groupBy(col("event_type"))
          .agg(expr("sum(cents) div count(1)").as("mu"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.join(broadcast(target), Seq("event_type"))
          .withColumn("c", sum(col("cents") - col("mu")).over(w))
          .withColumn("cusum_pos",
            col("c") - least(lit(0L), min(col("c")).over(w)))
          .withColumn("cusum_neg",
            greatest(lit(0L), max(col("c")).over(w)) - col("c"))
          .withColumn("changepoint",
            col("cusum_pos") > col("mu") || col("cusum_neg") > col("mu"))
          .select(col("event_type"), col("d"), col("cents"),
            col("cusum_pos"), col("cusum_neg"), col("changepoint"))
          .orderBy(col("event_type"), col("d"))
      },
      Some(cusumOracleSql),
      doc = "CUSUM changepoint detection per event type via the exact " +
        "prefix-sum identity (two cumulative windows, no sequential fold); " +
        "integer cents, per-type mean target, both-sided alarm"),

    // ---- Sliding exact MEDIAN over each user's trailing 7-day window —
    // the robust moving statistic w2's moving AVERAGE can't give (one
    // outlier day wrecks a mean; the median shrugs). No native moving-
    // median exists in either engine: both sides materialize the BOUNDED
    // frame (≤ 7 values) as a list and rank-select the lower median —
    // frame-bounded per-row work, user-partitioned window, exact integer
    // cents throughout.
    GQuery("w7_sliding_median",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
        val w7 = Window.partitionBy(col("user_id")).orderBy(col("d"))
          .rowsBetween(-6, 0)
        daily.withColumn("arr", sort_array(collect_list(col("cents")).over(w7)))
          .select(col("user_id"), col("d"),
            element_at(col("arr"),
              ceil(size(col("arr")) / 2.0).cast("int")).as("med7_cents"))
          .orderBy(col("user_id"), col("d"))
      },
      Some("""WITH daily AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
                FROM events GROUP BY 1, 2),
              fr AS (
                SELECT user_id, d,
                       list_sort(list(cents) OVER (PARTITION BY user_id ORDER BY d
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS ls
                FROM daily)
              SELECT user_id, d,
                     ls[CAST(ceil(len(ls) / 2.0) AS INT)] AS med7_cents
              FROM fr ORDER BY user_id, d"""),
      doc = "trailing 7-day moving exact median per user: bounded frame " +
        "materialized as a sorted list + lower-median rank selection"),

    // ---- Per-group OLS line from exact integer moments — the regression
    // sibling of agg_pearson_exact (same decimal moment machinery): slope
    // and intercept derived by a fixed IEEE op sequence over exact sums,
    // deterministic where the engines' native regr_slope/regr_intercept
    // accumulate floats in partial-aggregation order.
    GQuery("agg_regression_exact",
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          floor(col("l_quantity")).cast("decimal(18,0)").as("x"),
          floor(col("l_extendedprice")).cast("decimal(18,0)").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        // nullif-guard the variance denominator: a zero-variance-x group
        // yields Spark NULL (non-ANSI div-by-zero) vs DuckDB IEEE inf/NaN
        // — pin both engines to NULL so the contract holds on ANY fixture
        .select(col("l_returnflag"),
          col("n").cast("long").as("n_rows"),
          expr("CAST(n * sxy - sx * sy AS DOUBLE) " +
            "/ nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0D)").as("slope"),
          expr("(CAST(sy AS DOUBLE) " +
            "- CAST(n * sxy - sx * sy AS DOUBLE) / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0D) " +
            "* CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)").as("intercept"))
        .orderBy(col("l_returnflag")),
      Some("""WITH t AS (
                SELECT l_returnflag,
                       CAST(floor(l_quantity) AS HUGEINT) AS x,
                       CAST(floor(l_extendedprice) AS HUGEINT) AS y
                FROM lineitem),
              m AS (
                SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
                       SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                       SUM(x * x) AS sxx
                FROM t GROUP BY l_returnflag)
              SELECT l_returnflag,
                     CAST(n AS BIGINT) AS n_rows,
                     CAST(n * sxy - sx * sy AS DOUBLE)
                       / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0) AS slope,
                     (CAST(sy AS DOUBLE)
                      - CAST(n * sxy - sx * sy AS DOUBLE)
                        / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0)
                        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
              FROM m ORDER BY l_returnflag"""),
      doc = "per-group OLS slope/intercept from exact integer moments (decimal " +
        "sums, fixed IEEE op sequence) — deterministic where native " +
        "regr_slope/regr_intercept are accumulation-order-dependent")
  )
}
