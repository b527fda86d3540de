package graft.queries

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

import graft.{GQuery, Tables}

/** Scale-posture operators as oracle-checked queries: each one is a plan
  * shape that matters at 100 TB (iterative closure through the engine's own
  * recursion operator, generator fan-out, salted shuffle joins for hot keys,
  * bucket-co-located joins with zero exchange), proven result-transparent
  * against the plain declarative form the DuckDB oracle runs.
  */
object ScaleOpsQueries {

  private val seq = new AtomicLong(0)

  /** Shared by sketch_sample_quantiles (direct) and
    * sketch_bottomk_reaggregated (rolled up from persisted daily
    * sketches): bottom-k-of-union == true bottom-k, so both must equal
    * this — value-identical output is the merge-transparency proof.
    */
  private[queries] val sampleQuantilesOracle: String =
    """WITH pri AS (
                SELECT event_type, event_id, value,
                       CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS p
                FROM events),
              samp AS (
                SELECT event_type, event_id, value FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                               ORDER BY p, event_id) AS r
                  FROM pri) WHERE r <= 64),
              est AS (
                SELECT event_type, value AS est_median, n AS n_sample FROM (
                  SELECT event_type, value,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY value, event_id) AS vr,
                         COUNT(*) OVER (PARTITION BY event_type) AS n
                  FROM samp) WHERE vr = CAST(ceil(n / 2.0) AS BIGINT)),
              exact AS (
                SELECT event_type, value AS exact_median, n AS n_total FROM (
                  SELECT event_type, value,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY value, event_id) AS vr,
                         COUNT(*) OVER (PARTITION BY event_type) AS n
                  FROM events) WHERE vr = CAST(ceil(n / 2.0) AS BIGINT))
              SELECT e.event_type, x.n_total, e.n_sample, e.est_median, x.exact_median
              FROM est e JOIN exact x USING (event_type)
              ORDER BY e.event_type"""

  /** Shared by sketch_hll_distinct and sketch_hll_reaggregated: daily
    * max-then-max register merge equals the direct per-bucket max, so one
    * oracle pins both the direct and the re-aggregated form.
    */
  private[queries] val hllOracleSql: String =
    """WITH hashed AS (
         SELECT event_type,
                CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
         FROM events),
       rhos AS (
         SELECT event_type, h % 64 AS bucket,
                MAX(CASE WHEN h // 64 = 0 THEN 55
                         ELSE instr(lpad(bin(h // 64), 54, '0'), '1') END) AS rho
         FROM hashed GROUP BY 1, 2),
       grid AS (
         SELECT t.event_type, g.bucket
         FROM (SELECT DISTINCT event_type FROM events) t,
              (SELECT unnest(range(0, 64)) AS bucket) g),
       regs AS (
         SELECT grid.event_type, grid.bucket, COALESCE(r.rho, 0) AS m
         FROM grid LEFT JOIN rhos r
           ON r.event_type = grid.event_type AND r.bucket = grid.bucket),
       agg AS (
         SELECT event_type,
                string_agg(CAST(m AS VARCHAR), ',' ORDER BY bucket) AS registers,
                CAST(SUM(CAST(POWER(2, 55 - m) AS BIGINT)) AS BIGINT) AS sum_scaled
         FROM regs GROUP BY 1),
       exact AS (
         SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
         FROM events GROUP BY 1)
       SELECT a.event_type, a.registers, a.sum_scaled,
              CAST(2904.064 AS DOUBLE) * POWER(2.0, 55) / a.sum_scaled AS hll_estimate,
              e.exact_distinct
       FROM agg a JOIN exact e USING (event_type)
       ORDER BY a.event_type"""

  val all: Seq[GQuery] = Seq(

    // ---- Recursive CTE through Spark's native UnionLoop operator. The
    // hierarchy is a binary-heap tree over customer keys (parent(k) =
    // floor(k/2)): the anchor seeds the root, each iteration joins the
    // frontier against the table, and the engine's cteRecursionLevelLimit
    // bounds runaway recursion. Per-depth census keeps the output small and
    // integer-exact at any scale factor.
    GQuery("sql_recursive_cte",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("v_cust_rec")
        s.sql("""
          WITH RECURSIVE tree AS (
            SELECT c_custkey AS k, 0 AS depth FROM v_cust_rec WHERE c_custkey = 1
            UNION ALL
            SELECT c.c_custkey AS k, t.depth + 1 AS depth
            FROM v_cust_rec c JOIN tree t
              ON CAST(FLOOR(c.c_custkey / 2.0) AS BIGINT) = t.k
            WHERE c.c_custkey > 1
          )
          SELECT CAST(depth AS INT) AS depth, COUNT(*) AS n_nodes,
                 CAST(SUM(k) AS BIGINT) AS sum_keys,
                 MIN(k) AS min_key, MAX(k) AS max_key
          FROM tree GROUP BY depth ORDER BY depth""")
      },
      Some("""WITH RECURSIVE tree AS (
                SELECT c_custkey AS k, 0 AS depth FROM customer WHERE c_custkey = 1
                UNION ALL
                SELECT c.c_custkey AS k, t.depth + 1 AS depth
                FROM customer c JOIN tree t
                  ON CAST(FLOOR(c.c_custkey / 2.0) AS BIGINT) = t.k
                WHERE c.c_custkey > 1
              )
              SELECT CAST(depth AS INT) AS depth, COUNT(*) AS n_nodes,
                     CAST(SUM(k) AS BIGINT) AS sum_keys,
                     MIN(k) AS min_key, MAX(k) AS max_key
              FROM tree GROUP BY depth ORDER BY depth"""),
      doc = "WITH RECURSIVE heap-tree closure (UnionLoop) with per-depth census"),

    // ---- Generator / UDTF surface: posexplode fans each document out to
    // one row per token with its 1-based position. Narrow per-row fan-out —
    // no shuffle until the final presentation sort.
    GQuery("o14_posexplode_tokens",
      (s, dir) => Tables.documents(s, dir)
        .filter(col("doc_id") % 25 === 0)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).cast("int").as("ord"),
          col("col").as("tok"))
        .orderBy(col("doc_id"), col("ord")),
      Some("""SELECT doc_id,
                     CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS ord,
                     unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE doc_id % 25 = 0
              ORDER BY doc_id, ord"""),
      doc = "posexplode generator: per-token fan-out with ordinal positions"),

    // ---- Salted shuffle join (stages/Skew.saltedJoin): the hot-key dual of
    // agg_salted. The oracle runs the PLAIN join — salting must be result-
    // transparent, only the partitioning changes.
    GQuery("join_skew_salted",
      (s, dir) => {
        val big = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            col("value").cast("decimal(18,2)").as("value_d"))
        val dim = Tables.customer(s, dir)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        graft.stages.Skew.saltedJoin(big, dim, keys = Seq("user_id"),
            saltFrom = Seq(col("event_id")), salts = 16)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value_d")).cast("double").as("total_value"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c.c_mktsegment,
                     COUNT(*) AS n_events,
                     CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM events e JOIN customer c ON e.user_id = c.c_custkey
              GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""),
      doc = "deterministic salted shuffle join == plain join (hot-key skew tool, oracle-proven)"),

    // ---- Bucket-co-located join: both sides written CLUSTERED BY the join
    // key into the same bucket count, so the sort-merge join reads
    // pre-partitioned, pre-sorted buckets and the plan has NO exchange on
    // either side (ScaleSpec pins that plan shape). At 100 TB this is the
    // difference between joining in place and shuffling both tables. Fresh
    // uniquely-named external tables per invocation (same contract as the
    // lake queries: reruns independent, scratch cleaned at JVM exit).
    GQuery("join_bucketed_colocated",
      (s, dir) => {
        val id = seq.incrementAndGet()
        val scratch = graft.stages.TempDirs.scratch("graft_bucket_")
        val ot = s"orders_bk_$id"
        val lt = s"lineitem_bk_$id"
        Tables.orders(s, dir).select(col("o_orderkey"))
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$scratch/$ot").mode("overwrite").saveAsTable(ot)
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"))
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$scratch/$lt").mode("overwrite").saveAsTable(lt)
        // pinned to SMJ: a broadcast would be legal here at test scale but
        // the operator under test is the bucket co-location (zero exchange
        // under the join at ANY scale) — plan-guarded in PlanAuditSpec
        val perOrder = s.table(ot).hint("merge")
          .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("qty"))
        perOrder
          .groupBy(col("n_lines"))
          .agg(count(lit(1)).as("n_orders"), sum(col("qty")).as("total_qty"))
          .orderBy(col("n_lines"))
      },
      Some("""WITH per_order AS (
                SELECT o.o_orderkey, COUNT(*) AS n_lines, SUM(l.l_quantity) AS qty
                FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
                GROUP BY o.o_orderkey)
              SELECT n_lines, COUNT(*) AS n_orders, SUM(qty) AS total_qty
              FROM per_order GROUP BY n_lines ORDER BY n_lines"""),
      doc = "bucketed tables co-locate the join: zero-exchange SMJ + partial agg on the bucket key"),

    // ---- Bucket PRUNING on point lookups: a table clustered into 16
    // buckets by customer key serves an equality probe from exactly ONE
    // bucket's files (the plan shows SelectedBucketsCount: 1 out of 16 —
    // pinned in PlanAuditSpec). At 100 TB this is the storage-layout
    // mechanism that turns a needle query from a full scan into 1/16th
    // of one, orthogonal to partition pruning (scan_partition_pruning)
    // and file-stats row-group pruning (lake_rowlevel_pruned).
    GQuery("scan_bucket_pruned",
      (s, dir) => {
        val id = seq.incrementAndGet()
        val scratch = graft.stages.TempDirs.scratch("graft_bprune_")
        val t = s"orders_bp_$id"
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * 100).cast("long").as("price_cents"))
          .write.bucketBy(16, "o_custkey").sortBy("o_orderkey")
          .option("path", s"$scratch/$t").mode("overwrite").saveAsTable(t)
        s.table(t).filter(col("o_custkey") === 19)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), sum(col("price_cents")).as("total_cents"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, count(*) AS n_orders,
                     CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
              FROM orders WHERE o_custkey = 19
              GROUP BY o_custkey ORDER BY o_custkey"""),
      doc = "bucket pruning: equality probe on the bucket key reads 1 of 16 " +
        "buckets (plan-pinned SelectedBucketsCount) — needle lookups without " +
        "a full scan"),

    // ---- Bloom-filter semi-join reduction (ops/BloomJoin): the build side
    // folds to one m-bit bitset row, broadcasts, and prunes the probe side
    // with a per-row codegen'd expression BEFORE the exact join. The oracle
    // is the plain join — no false negatives means the rewrite is
    // result-transparent; false positives die in the exact join.
    GQuery("join_bloom_pruned",
      (s, dir) => {
        val build = Tables.orders(s, dir)
          .filter(col("o_totalprice") > 400000)
          .select(col("o_orderkey"), col("o_orderpriority"))
        val probe = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_quantity"))
        graft.ops.BloomJoin.prune(
            probe, "l_orderkey", build.select(col("o_orderkey")), "o_orderkey")
          .join(build, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("total_qty"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o.o_orderpriority, COUNT(*) AS n_lines, SUM(l.l_quantity) AS total_qty
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE o.o_totalprice > 400000
              GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"""),
      doc = "bloom-pruned join == plain join (semi-join reduction, oracle-proven transparent)"),

    // ---- HyperLogLog distinct sketch (functions/HllAggregator): 64
    // registers per group, elementwise-max mergeable; registers, the exact
    // integer harmonic sum, and the raw estimate are all reproduced by the
    // oracle from the shared md5 primitive. Exact distinct carried
    // alongside as the accuracy reference.
    GQuery("sketch_hll_distinct",
      (s, dir) => {
        import s.implicits._
        import graft.functions.HllAggregator
        val sketch = Tables.events(s, dir)
          .select(col("event_type"), expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
          .as[(String, Long)]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(HllAggregator.hll().toColumn)
          .map { case (t, o) => (t, o.registers, o.sum_scaled, o.estimate) }
          .toDF("event_type", "registers", "sum_scaled", "hll_estimate")
        val exact = Tables.events(s, dir).groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_distinct"))
        sketch.join(exact, Seq("event_type")).orderBy(col("event_type"))
      },
      Some(hllOracleSql),
      doc = "HyperLogLog distinct sketch: registers, exact harmonic sum, and raw estimate oracle-reproduced"),

    // ---- HLL RE-AGGREGATION: the storage pattern the sketch exists for —
    // persist one 64-register sketch per (event_type, day) (here a real
    // scratch-parquet daily table), answer the month by elementwise-max
    // MERGE of the stored sketches, never rescanning raw events. Daily
    // max-then-max equals the direct per-bucket max, so this query shares
    // sketch_hll_distinct's oracle verbatim (the curate_domain_cap_agg
    // shared-oracle convention): value-identical output proves merge
    // transparency. At 100 TB the rollup reads |days|x|types| sketch rows
    // (64 bytes each), not the corpus.
    GQuery("sketch_hll_reaggregated",
      (s, dir) => {
        import s.implicits._
        import graft.functions.HllAggregator
        val out = graft.stages.TempDirs.scratchStable("graft_hll_daily_")
        Tables.events(s, dir)
          .select(col("event_type"), dayofmonth(col("ts")).as("day"), expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
          .as[(String, Int, Long)]
          .groupByKey(t => (t._1, t._2))
          .mapValues(_._3)
          .agg(HllAggregator.hll().toColumn)
          .map { case ((t, d), o) => (t, d, o.registers) }
          .toDF("event_type", "day", "registers")
          .write.mode("overwrite").parquet(out)
        val merged = s.read.parquet(out)
          .select(col("event_type"),
            posexplode(split(col("registers"), ",")).as(Seq("bucket", "mstr")))
          .select(col("event_type"), col("bucket"), col("mstr").cast("int").as("m"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(max(col("m")).as("m"))
          .groupBy(col("event_type"))
          .agg(
            expr("array_join(transform(sort_array(collect_list(struct(bucket, m))), " +
              "x -> CAST(x.m AS STRING)), ',')").as("registers"),
            expr("SUM(shiftleft(CAST(1 AS BIGINT), 55 - m))").as("sum_scaled"))
          .withColumn("hll_estimate",
            expr("CAST(2904.064 AS DOUBLE) * power(2.0, 55) / sum_scaled"))
        val exact = Tables.events(s, dir).groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_distinct"))
        merged.join(exact, Seq("event_type")).orderBy(col("event_type"))
      },
      Some(hllOracleSql),
      doc = "month-level HLL answered by merging persisted per-day sketches " +
        "(elementwise register max) == direct sketch (shared oracle): the " +
        "mergeable-summaries storage pattern"),

    // ---- ROLLING 7-day distinct-user estimate from the SAME persisted
    // daily sketches: the query shape the daily-sketch table exists for —
    // 31 overlapping answers (one per day) from one table of
    // |types|×|days|×64 registers, where the exact rolling-distinct form
    // (agg_rolling_distinct_users) pays a ×7 fan-out of the corpus-scale
    // (user, day) set every time. Register max over a trailing ROWS frame
    // per (type, bucket) — bounded partitions, day-ordered — then the
    // same harmonic estimate, oracle-reproduced bit-exactly.
    GQuery("sketch_hll_rolling7d",
      (s, dir) => {
        import s.implicits._
        import graft.functions.HllAggregator
        import org.apache.spark.sql.expressions.Window
        val out = graft.stages.TempDirs.scratchStable("graft_hll_daily7_")
        Tables.events(s, dir)
          .select(col("event_type"), dayofmonth(col("ts")).as("day"), expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
          .as[(String, Int, Long)]
          .groupByKey(t => (t._1, t._2))
          .mapValues(_._3)
          .agg(HllAggregator.hll().toColumn)
          .map { case ((t, d), o) => (t, d, o.registers) }
          .toDF("event_type", "day", "registers")
          .write.mode("overwrite").parquet(out)
        val w7 = Window.partitionBy(col("event_type"), col("bucket"))
          .orderBy(col("day")).rowsBetween(-6, 0)
        s.read.parquet(out)
          .select(col("event_type"), col("day"),
            posexplode(split(col("registers"), ",")).as(Seq("bucket", "mstr")))
          .select(col("event_type"), col("day"), col("bucket"),
            col("mstr").cast("int").as("m"))
          .withColumn("rm", max(col("m")).over(w7))
          .groupBy(col("event_type"), col("day"))
          .agg(expr("SUM(shiftleft(CAST(1 AS BIGINT), 55 - rm))").as("sum_scaled"))
          .withColumn("hll_estimate",
            expr("CAST(2904.064 AS DOUBLE) * power(2.0, 55) / sum_scaled"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH hashed AS (
                SELECT event_type, date_part('day', ts) AS day,
                       CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
                FROM events),
              rhos AS (
                SELECT event_type, day, h % 64 AS bucket,
                       MAX(CASE WHEN h // 64 = 0 THEN 55
                                ELSE instr(lpad(bin(h // 64), 54, '0'), '1') END) AS rho
                FROM hashed GROUP BY 1, 2, 3),
              days AS (SELECT DISTINCT event_type, day FROM hashed),
              grid AS (SELECT d.event_type, d.day, g.bucket
                       FROM days d, (SELECT unnest(range(0, 64)) AS bucket) g),
              regs AS (SELECT grid.event_type, grid.day, grid.bucket,
                              COALESCE(r.rho, 0) AS m
                       FROM grid LEFT JOIN rhos r
                         ON r.event_type = grid.event_type
                        AND r.day = grid.day AND r.bucket = grid.bucket),
              roll AS (SELECT event_type, day, bucket,
                              MAX(m) OVER (PARTITION BY event_type, bucket
                                           ORDER BY day
                                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rm
                       FROM regs),
              agg AS (SELECT event_type, day,
                             CAST(SUM(CAST(POWER(2, 55 - rm) AS BIGINT)) AS BIGINT) AS sum_scaled
                      FROM roll GROUP BY 1, 2)
              SELECT event_type, CAST(day AS INT) AS day, sum_scaled,
                     CAST(2904.064 AS DOUBLE) * POWER(2.0, 55) / sum_scaled AS hll_estimate
              FROM agg ORDER BY event_type, day"""),
      doc = "rolling 7-day distinct estimate from persisted daily HLL sketches: " +
        "trailing register-max frame per (type, bucket) + harmonic estimate — " +
        "31 overlapping answers from the sketch table, never the corpus"),

    // ---- EXACT distinct via persisted roaring bitmaps (Spark 4
    // bitmap_construct_agg / bitmap_or_agg / bitmap_count): the
    // re-aggregable EXACT twin of the HLL family — one bitmap per
    // (type, day, 32k-id bucket) persisted to a scratch table, day
    // answers read their own rows, the month answer OR-merges the
    // stored bitmaps, the raw events never rescanned. Where HLL trades
    // exactness for fixed 64-register size, the bitmap index is exact
    // at |users|/8 bits per bucket worst case — the right rung when ids
    // are dense (our user ids are) and the consumer needs the true
    // count (billing, dedup audits). Oracle = plain COUNT(DISTINCT) at
    // both grains, proving merge transparency.
    GQuery("sketch_bitmap_distinct",
      (s, dir) => {
        val out = graft.stages.TempDirs.scratchStable("graft_bitmap_daily_")
        Tables.events(s, dir)
          .select(col("event_type"), dayofmonth(col("ts")).as("day"), col("user_id"))
          .groupBy(col("event_type"), col("day"),
            expr("bitmap_bucket_number(user_id)").as("bucket"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
          .write.mode("overwrite").parquet(out)
        val daily = s.read.parquet(out)
        val perDay = daily.groupBy(col("event_type"), col("day"))
          .agg(sum(expr("bitmap_count(bm)")).as("n_users_day"))
        val perMonth = daily
          .groupBy(col("event_type"), col("bucket"))
          .agg(expr("bitmap_or_agg(bm)").as("mbm"))
          .groupBy(col("event_type"))
          .agg(sum(expr("bitmap_count(mbm)")).as("n_users_month"))
        perDay.join(perMonth, Seq("event_type"))
          .select(col("event_type"), col("day"), col("n_users_day"),
            col("n_users_month"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH pd AS (
                SELECT event_type, CAST(date_part('day', ts) AS INT) AS day,
                       COUNT(DISTINCT user_id) AS n_users_day
                FROM events GROUP BY 1, 2),
              pm AS (
                SELECT event_type, COUNT(DISTINCT user_id) AS n_users_month
                FROM events GROUP BY 1)
              SELECT pd.event_type, pd.day, pd.n_users_day, pm.n_users_month
              FROM pd JOIN pm USING (event_type)
              ORDER BY pd.event_type, pd.day"""),
      doc = "exact distinct from persisted day-grain roaring bitmaps " +
        "(bitmap_construct_agg): day answers read stored rows, the month " +
        "answer OR-merges them (bitmap_or_agg) — the exact re-aggregable " +
        "twin of the HLL sketch table, == COUNT(DISTINCT) at both grains"),

    // ---- bottom-k-by-hash sampling (ops/Sketch.hashSampleQuantiles): the
    // deterministic, mergeable uniform sample (keep the k smallest md5
    // priorities — union + keep-k-smallest merges, the KMV property), with
    // per-group lower-median estimated from the sample next to the exact
    // group median as the built-in error report.
    GQuery("sketch_sample_quantiles",
      (s, dir) => graft.ops.Sketch.hashSampleQuantiles(
          Tables.events(s, dir), Seq("event_type"), "value", "event_id", k = 64)
        .orderBy(col("event_type")),
      Some(sampleQuantilesOracle),
      doc = "bottom-k-by-hash uniform sample + per-group lower-median estimate " +
        "vs exact (deterministic mergeable sampling — distributed order statistics)"),

    // ---- The same answer from PERSISTED per-day bottom-k sketches: the
    // sample-sketch LIFECYCLE (store |types|x|days|x64 sketch rows daily,
    // roll the month up from sketches alone). Bottom-k merge is exactly
    // transparent — the month's true bottom-k is contained in the union
    // of daily bottom-ks — so this shares sketch_sample_quantiles' oracle
    // VERBATIM (the sketch_hll_reaggregated convention): value-identical
    // output IS the merge-transparency proof.
    GQuery("sketch_bottomk_reaggregated",
      (s, dir) => graft.ops.Sketch.hashSampleQuantilesFromDaily(
          Tables.events(s, dir), Seq("event_type"), "value", "event_id",
          dayofmonth(col("ts")), k = 64,
          graft.stages.TempDirs.scratchStable("graft_bk_daily_"))
        .orderBy(col("event_type")),
      Some(sampleQuantilesOracle),
      doc = "month quantile report rolled up from persisted DAILY bottom-k " +
        "sketches — bottom-k-of-union == true bottom-k, proven by sharing the " +
        "direct query's oracle"),

    // ---- Misra-Gries daily-sketch lifecycle: one MG(k) candidate sketch
    // per day persisted (≤ k keys × |days| rows), the month's heavy
    // hitters answered from the sketch UNION + one exact candidate
    // recount. Completeness is provable without sketch-merge semantics:
    // a key with monthly count > n/(k+1) = Σ n_d/(k+1) must exceed
    // n_d/(k+1) on at least one day (else the sum bounds it), so it
    // survives THAT day's sketch — the union is a complete candidate set,
    // and the exact recount + integer threshold make the output
    // deterministic (the sketch_mg_heavy_tokens prune-then-verify shape,
    // lifted to the persisted-daily lifecycle). k=4 over 5 event types
    // exercises eviction daily; at 100 TB the rollup reads the sketch
    // table and one candidate-filtered recount, never an unbounded
    // key-space aggregate.
    GQuery("sketch_mg_daily_merge",
      (s, dir) => {
        import s.implicits._
        val k = 4
        val out = graft.stages.TempDirs.scratchStable("graft_mg_daily_")
        val ev = Tables.events(s, dir)
          .select(col("event_type"), dayofmonth(col("ts")).as("day"))
        ev.select(col("day"), col("event_type")).as[(Int, String)]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(graft.functions.MgAggregator.mg(k).toColumn)
          .toDF("day", "cands")
          .write.mode("overwrite").parquet(out)
        val cands = s.read.parquet(out)
          .select(explode(col("cands")).as("t")).distinct()
          .collect().map(_.getString(0)).toSeq // bounded: <= k x |days|
        val total = ev.count()
        ev.filter(col("event_type").isin(cands: _*))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"))
          .filter(col("n_events") * (k + 1) > total)
          .orderBy(col("event_type"))
      },
      Some("""WITH n AS (SELECT count(*) AS n FROM events)
              SELECT event_type, count(*) AS n_events
              FROM events GROUP BY event_type
              HAVING count(*) * 5 > (SELECT n FROM n)
              ORDER BY event_type"""),
      doc = "monthly heavy hitters from persisted DAILY Misra-Gries sketches: " +
        "union of daily candidates (provably complete) + exact recount + " +
        "integer threshold == the quadratic-free exact answer"),

    // ---- columnar-format breadth: the same declarative plan over an ORC
    // round-trip — Spark's second first-class columnar format shares the
    // vectorized-scan/pushdown machinery, so a lake deployed on ORC files
    // (Hive estates) gets identical semantics; the oracle reads the
    // original parquet, proving the round-trip lossless.
    GQuery("scan_orc_roundtrip",
      (s, dir) => {
        val out = graft.stages.TempDirs.scratch("graft_orc_")
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("price_cents"))
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .filter(col("o_orderkey") % 10 === 0)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("price_cents")).as("total_cents"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
                     count(*) AS n_orders,
                     CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
              FROM orders WHERE o_orderkey % 10 = 0
              GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      doc = "ORC write + vectorized read round-trip == parquet-sourced oracle " +
        "(format breadth: same declarative plan, same pushdown machinery)"),

    // CSV round-trip — the interchange format ingestion actually arrives
    // in. Money rides as integer cents (CSV has no decimal type), the
    // free-text column keeps embedded commas (quoting must hold), and the
    // read side declares an explicit schema — schema inference is a
    // full extra pass over 100 TB and is never the production shape. The
    // comment-length sum proves the text survived quoting bit-for-bit.
    GQuery("scan_csv_roundtrip",
      (s, dir) => {
        val out = graft.stages.TempDirs.scratch("graft_csv_")
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"),
            concat_ws(", ", col("o_orderpriority"), col("o_orderstatus")).as("note"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("price_cents"))
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read
          .schema("o_orderkey BIGINT, o_orderstatus STRING, note STRING, price_cents BIGINT")
          .option("header", "true").csv(out)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("price_cents")).as("total_cents"),
            sum(length(col("note"))).as("note_chars"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
                     count(*) AS n_orders,
                     CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                     CAST(SUM(length(o_orderpriority || ', ' || o_orderstatus)) AS BIGINT) AS note_chars
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      doc = "CSV write + explicit-schema read round-trip == parquet-sourced oracle " +
        "(quoted free text with embedded commas survives; no inference pass)"),

    // ---- XML round-trip: Spark 4's built-in XML data source (the
    // spark-xml connector merged into spark-sql) — the feed format B2B
    // ingestion still arrives in. The note column embeds '&' and '<'
    // characters, so the census proves entity escaping round-trips
    // bit-for-bit; the read declares an explicit schema + rowTag (no
    // inference pass over 100 TB).
    GQuery("scan_xml_roundtrip",
      (s, dir) => {
        val out = graft.stages.TempDirs.scratch("graft_xml_")
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"),
            concat_ws(" & ", col("o_orderpriority"),
              concat(lit("<"), col("o_orderstatus"), lit(">"))).as("note"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("price_cents"))
          .write.mode("overwrite").option("rowTag", "order").xml(out)
        s.read
          .schema("o_orderkey BIGINT, o_orderstatus STRING, note STRING, price_cents BIGINT")
          .option("rowTag", "order").xml(out)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("price_cents")).as("total_cents"),
            sum(length(col("note"))).as("note_chars"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
                     count(*) AS n_orders,
                     CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                     CAST(SUM(length(o_orderpriority || ' & <' || o_orderstatus || '>')) AS BIGINT) AS note_chars
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      doc = "XML write + explicit-schema rowTag read round-trip == " +
        "parquet-sourced oracle (Spark 4 built-in XML source; '&'/'<' " +
        "entity escaping survives, no inference pass)"),

    // ---- Integer PageRank over a deterministic irregular link graph
    // (edges k -> 2k, 2k+1, 3k over customer keys; a pure heap tree is
    // DEGENERATE — uniform in/out degree keeps mass uniform forever, so
    // the 3k chords vary both degrees): the link-authority prior
    // CommonCrawl-style curation attaches to documents, in exact integer
    // arithmetic so the iteration trajectory is bit-identical
    // cross-engine. 3 rounds, each ONE src-keyed join + one dst groupBy,
    // lineage cut per round (localCheckpoint). The mass histogram is the
    // checkable surface.
    GQuery("graph_pagerank_census",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val cand = nodes.select(col("node").as("src"), (col("node") * 2).as("dst"))
          .unionByName(nodes.select(col("node").as("src"), (col("node") * 2 + 1).as("dst")))
          .unionByName(nodes.select(col("node").as("src"), (col("node") * 3).as("dst")))
          .filter(col("src") >= 1 && col("dst") >= 1)
        val edges = cand.join(nodes.withColumnRenamed("node", "dst"),
          Seq("dst"), "left_semi")
        graft.ops.GraphOps.pagerankInteger(nodes, edges, iters = 3)
          .groupBy(col("mass")).agg(count(lit(1)).as("n_nodes"))
          .orderBy(col("mass"))
      },
      Some("""WITH nodes AS (SELECT c_custkey AS node FROM customer),
              cand AS (
                SELECT node AS src, node * 2 AS dst FROM nodes
                UNION ALL
                SELECT node AS src, node * 2 + 1 AS dst FROM nodes
                UNION ALL
                SELECT node AS src, node * 3 AS dst FROM nodes),
              edges AS (
                SELECT src, dst FROM cand e
                WHERE src >= 1 AND dst >= 1
                  AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.dst)),
              deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
              ed AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)),
              r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes),
              c1 AS (SELECT ed.dst AS node,
                            SUM((85 * r0.mass) // (100 * ed.outdeg)) AS im
                     FROM ed JOIN r0 ON r0.node = ed.src GROUP BY ed.dst),
              r1 AS (SELECT n.node, CAST(150000 + COALESCE(c1.im, 0) AS BIGINT) AS mass
                     FROM nodes n LEFT JOIN c1 USING (node)),
              c2 AS (SELECT ed.dst AS node,
                            SUM((85 * r1.mass) // (100 * ed.outdeg)) AS im
                     FROM ed JOIN r1 ON r1.node = ed.src GROUP BY ed.dst),
              r2 AS (SELECT n.node, CAST(150000 + COALESCE(c2.im, 0) AS BIGINT) AS mass
                     FROM nodes n LEFT JOIN c2 USING (node)),
              c3 AS (SELECT ed.dst AS node,
                            SUM((85 * r2.mass) // (100 * ed.outdeg)) AS im
                     FROM ed JOIN r2 ON r2.node = ed.src GROUP BY ed.dst),
              r3 AS (SELECT n.node, CAST(150000 + COALESCE(c3.im, 0) AS BIGINT) AS mass
                     FROM nodes n LEFT JOIN c3 USING (node))
              SELECT mass, count(*) AS n_nodes FROM r3
              GROUP BY mass ORDER BY mass"""),
      doc = "integer PageRank (3 exact rounds over the heap-tree graph): " +
        "iterative authority mass, per-round join+agg, lineage cut per round"),

    // ---- Personalized PageRank over the same heap-tree graph: restart
    // mass confined to the seed set (node < 16) — the TrustRank shape;
    // mass histogram output like graph_pagerank_census, unrolled oracle.
    GQuery("graph_ppr_seeded",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val cand = nodes.select(col("node").as("src"), (col("node") * 2).as("dst"))
          .unionByName(nodes.select(col("node").as("src"), (col("node") * 2 + 1).as("dst")))
          .unionByName(nodes.select(col("node").as("src"), (col("node") * 3).as("dst")))
          .filter(col("src") >= 1 && col("dst") >= 1)
        val edges = cand.join(nodes.withColumnRenamed("node", "dst"),
          Seq("dst"), "left_semi")
        graft.ops.GraphOps.pprInteger(nodes, edges, col("node") < 16, iters = 3)
          .groupBy(col("mass")).agg(count(lit(1)).as("n_nodes"))
          .orderBy(col("mass"))
      },
      Some("""WITH nodes AS (SELECT c_custkey AS node FROM customer),
              cand AS (
                SELECT node AS src, node * 2 AS dst FROM nodes
                UNION ALL
                SELECT node AS src, node * 2 + 1 AS dst FROM nodes
                UNION ALL
                SELECT node AS src, node * 3 AS dst FROM nodes),
              edges AS (
                SELECT src, dst FROM cand e
                WHERE src >= 1 AND dst >= 1
                  AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.dst)),
              deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
              ed AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)),
              r0 AS (SELECT node, CAST(CASE WHEN node < 16 THEN 1000000 ELSE 0 END AS BIGINT) AS mass
                     FROM nodes),
              c1 AS (SELECT ed.dst AS node,
                            SUM((85 * r0.mass) // (100 * ed.outdeg)) AS im
                     FROM ed JOIN r0 ON r0.node = ed.src GROUP BY ed.dst),
              r1 AS (SELECT n.node,
                            CAST(CASE WHEN n.node < 16 THEN 150000 ELSE 0 END
                                 + COALESCE(c1.im, 0) AS BIGINT) AS mass
                     FROM nodes n LEFT JOIN c1 USING (node)),
              c2 AS (SELECT ed.dst AS node,
                            SUM((85 * r1.mass) // (100 * ed.outdeg)) AS im
                     FROM ed JOIN r1 ON r1.node = ed.src GROUP BY ed.dst),
              r2 AS (SELECT n.node,
                            CAST(CASE WHEN n.node < 16 THEN 150000 ELSE 0 END
                                 + COALESCE(c2.im, 0) AS BIGINT) AS mass
                     FROM nodes n LEFT JOIN c2 USING (node)),
              c3 AS (SELECT ed.dst AS node,
                            SUM((85 * r2.mass) // (100 * ed.outdeg)) AS im
                     FROM ed JOIN r2 ON r2.node = ed.src GROUP BY ed.dst),
              r3 AS (SELECT n.node,
                            CAST(CASE WHEN n.node < 16 THEN 150000 ELSE 0 END
                                 + COALESCE(c3.im, 0) AS BIGINT) AS mass
                     FROM nodes n LEFT JOIN c3 USING (node))
              SELECT mass, count(*) AS n_nodes FROM r3
              GROUP BY mass ORDER BY mass"""),
      doc = "personalized (seed-restart) integer PageRank, 3 exact rounds: " +
        "authority relative to a trusted seed set — the TrustRank curation " +
        "signal; same per-round join+agg shape as graph_pagerank_census"),

    // ---- Integer HITS over the same heap-tree graph: hubs & authorities
    // as exact integers (per-round total-rescale via `mass·1e6 div total`
    // — 1-row scalar broadcast), 2 unrolled rounds in the oracle; output
    // is the top-20 of each score (TakeOrdered + kind-partitioned rank,
    // never an unpartitioned window).
    GQuery("graph_hits",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val cand = nodes.select(col("node").as("src"), (col("node") * 2).as("dst"))
          .unionByName(nodes.select(col("node").as("src"), (col("node") * 2 + 1).as("dst")))
          .unionByName(nodes.select(col("node").as("src"), (col("node") * 3).as("dst")))
          .filter(col("src") >= 1 && col("dst") >= 1)
        val edges = cand.join(nodes.withColumnRenamed("node", "dst"),
          Seq("dst"), "left_semi")
        val res = graft.ops.GraphOps.hitsInteger(nodes, edges, iters = 2)
        val topA = res.select(lit("auth").as("kind"), col("node"),
            col("auth_mass").as("mass"))
          .orderBy(col("mass").desc, col("node")).limit(20)
        val topH = res.select(lit("hub").as("kind"), col("node"),
            col("hub_mass").as("mass"))
          .orderBy(col("mass").desc, col("node")).limit(20)
        topA.unionByName(topH)
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("kind"))
              .orderBy(col("mass").desc, col("node"))))
          .select(col("kind"), col("rank"), col("node"), col("mass"))
          .orderBy(col("kind"), col("rank"))
      },
      Some("""WITH nodes AS (SELECT c_custkey AS node FROM customer),
              cand AS (
                SELECT node AS src, node * 2 AS dst FROM nodes
                UNION ALL
                SELECT node AS src, node * 2 + 1 AS dst FROM nodes
                UNION ALL
                SELECT node AS src, node * 3 AS dst FROM nodes),
              edges AS (
                SELECT src, dst FROM cand e
                WHERE src >= 1 AND dst >= 1
                  AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.dst)),
              h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS m FROM nodes),
              a1r AS (SELECT e.dst AS node, CAST(SUM(h0.m) AS BIGINT) AS raw
                      FROM edges e JOIN h0 ON h0.node = e.src GROUP BY e.dst),
              a1t AS (SELECT CAST(COALESCE(SUM(raw), 1) AS BIGINT) AS t FROM a1r),
              a1 AS (SELECT n.node, COALESCE(r.raw, 0) * 1000000 // t AS m
                     FROM nodes n LEFT JOIN a1r r USING (node), a1t),
              h1r AS (SELECT e.src AS node, CAST(SUM(a1.m) AS BIGINT) AS raw
                      FROM edges e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
              h1t AS (SELECT CAST(COALESCE(SUM(raw), 1) AS BIGINT) AS t FROM h1r),
              h1 AS (SELECT n.node, COALESCE(r.raw, 0) * 1000000 // t AS m
                     FROM nodes n LEFT JOIN h1r r USING (node), h1t),
              a2r AS (SELECT e.dst AS node, CAST(SUM(h1.m) AS BIGINT) AS raw
                      FROM edges e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
              a2t AS (SELECT CAST(COALESCE(SUM(raw), 1) AS BIGINT) AS t FROM a2r),
              a2 AS (SELECT n.node, COALESCE(r.raw, 0) * 1000000 // t AS m
                     FROM nodes n LEFT JOIN a2r r USING (node), a2t),
              h2r AS (SELECT e.src AS node, CAST(SUM(a2.m) AS BIGINT) AS raw
                      FROM edges e JOIN a2 ON a2.node = e.dst GROUP BY e.src),
              h2t AS (SELECT CAST(COALESCE(SUM(raw), 1) AS BIGINT) AS t FROM h2r),
              h2 AS (SELECT n.node, COALESCE(r.raw, 0) * 1000000 // t AS m
                     FROM nodes n LEFT JOIN h2r r USING (node), h2t),
              ranked AS (
                SELECT 'auth' AS kind,
                       CAST(ROW_NUMBER() OVER (ORDER BY m DESC, node) AS INT) AS rank,
                       node, m AS mass
                FROM a2
                UNION ALL
                SELECT 'hub',
                       CAST(ROW_NUMBER() OVER (ORDER BY m DESC, node) AS INT),
                       node, m
                FROM h2)
              SELECT kind, rank, node, mass FROM ranked
              WHERE rank <= 20 ORDER BY kind, rank"""),
      doc = "integer HITS (2 exact rounds): hub/authority mass with per-round " +
        "integer total-rescale, top-20 of each score — link-authority priors " +
        "for URL curation, bit-identical across engines"),

    // ---- Triangle census by degree-ordered orientation over an irregular
    // undirected graph (chords +1, +2, +3, x2 over customer keys — the x2
    // edges skew degree so orientation actually reorders). The wedge join
    // fans out ONLY from each node's oriented out-neighborhood, bounded
    // O(sqrt(m)) per node regardless of hubs — the naive neighborhood
    // self-join the oracle runs would enumerate deg^2 wedges per hub and
    // is exactly what dies first on a power-law web graph at 100 TB. The
    // per-node participation histogram is the checkable surface (triangle
    // support is the classic spam/cohesion feature curation attaches).
    GQuery("graph_triangle_census",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        // strict a < b canonical form (inside chordGraph): key 0 makes
        // node*2 a self-loop, which is not an edge (and would fabricate
        // degenerate "triangles")
        val und = graft.ops.GraphOps.chordGraph(nodes)
        graft.ops.GraphOps.trianglePerNode(nodes, und)
          .groupBy(col("tri_count")).agg(count(lit(1)).as("n_nodes"))
          .orderBy(col("tri_count"))
      },
      Some("""WITH nodes AS (SELECT c_custkey AS node FROM customer),
              und AS (
                SELECT DISTINCT a, b FROM (
                  SELECT node AS a, node + 1 AS b FROM nodes
                  UNION ALL SELECT node, node + 2 FROM nodes
                  UNION ALL SELECT node, node + 3 FROM nodes
                  UNION ALL SELECT node, node * 2 FROM nodes) e
                WHERE a < b
                  AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
              tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM und e1
                JOIN und e2 ON e2.a = e1.b
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
              per_node AS (
                SELECT node, count(*) AS c FROM (
                  SELECT x AS node FROM tri
                  UNION ALL SELECT y FROM tri
                  UNION ALL SELECT z FROM tri) GROUP BY node),
              allc AS (
                SELECT n.node, CAST(COALESCE(p.c, 0) AS BIGINT) AS tri_count
                FROM nodes n LEFT JOIN per_node p USING (node))
              SELECT tri_count, count(*) AS n_nodes FROM allc
              GROUP BY tri_count ORDER BY tri_count"""),
      doc = "degree-ordered triangle counting (oriented wedge join, O(sqrt(m)) " +
        "fan-out per node) == naive 3-way closure oracle; per-node histogram"),

    // ---- k-core peeling census (k=5, 3 bounded rounds) over the same
    // irregular graph: per round one explode-degree aggregation + two
    // semi-joins, lineage cut per round — the iterative dense-subgraph
    // scaffold extraction (peel tendrils, keep the robust core) with the
    // same bounded-round oracle convention as the PageRank trajectory.
    GQuery("graph_kcore_census",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val und = graft.ops.GraphOps.chordGraph(nodes)
        graft.ops.GraphOps.kcorePeelCensus(und, k = 5, rounds = 3)
          .orderBy(col("round"))
      },
      Some("""WITH nodes AS (SELECT c_custkey AS node FROM customer),
              und AS (
                SELECT DISTINCT a, b FROM (
                  SELECT node AS a, node + 1 AS b FROM nodes
                  UNION ALL SELECT node, node + 2 FROM nodes
                  UNION ALL SELECT node, node + 3 FROM nodes
                  UNION ALL SELECT node, node * 2 FROM nodes) e
                WHERE a < b
                  AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
              d1 AS (SELECT node, count(*) AS c FROM (
                       SELECT a AS node FROM und UNION ALL SELECT b FROM und)
                     GROUP BY node),
              a1 AS (SELECT node FROM d1 WHERE c >= 5),
              e1 AS (SELECT a, b FROM und
                     WHERE a IN (SELECT node FROM a1) AND b IN (SELECT node FROM a1)),
              d2 AS (SELECT node, count(*) AS c FROM (
                       SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1)
                     GROUP BY node),
              a2 AS (SELECT node FROM d2 WHERE c >= 5),
              e2 AS (SELECT a, b FROM e1
                     WHERE a IN (SELECT node FROM a2) AND b IN (SELECT node FROM a2)),
              d3 AS (SELECT node, count(*) AS c FROM (
                       SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2)
                     GROUP BY node),
              a3 AS (SELECT node FROM d3 WHERE c >= 5),
              e3 AS (SELECT a, b FROM e2
                     WHERE a IN (SELECT node FROM a3) AND b IN (SELECT node FROM a3))
              SELECT CAST(1 AS INT) AS round,
                     (SELECT count(*) FROM a1) AS n_nodes_alive,
                     (SELECT count(*) FROM e1) AS n_edges_alive
              UNION ALL
              SELECT 2, (SELECT count(*) FROM a2), (SELECT count(*) FROM e2)
              UNION ALL
              SELECT 3, (SELECT count(*) FROM a3), (SELECT count(*) FROM e3)
              ORDER BY round"""),
      doc = "5-core peeling, 3 exact rounds (alive node/edge trajectory): " +
        "iterative degree-filter semi-join restriction, lineage cut per round"),

    // ---- JSON-lines round-trip: the corpus's free text (quotes, unicode,
    // arbitrary punctuation) written as JSONL and read back with a DECLARED
    // schema — schema-on-read without an inference pass, the reference's
    // landing-format posture (its API speaks JSON). The census proves the
    // payload survived encoding byte-for-byte (summed lengths + md5-derived
    // checksum), compared against the parquet-sourced oracle.
    GQuery("scan_json_roundtrip",
      (s, dir) => {
        val out = graft.stages.TempDirs.scratch("graft_json_")
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("text"))
          .write.mode("overwrite").json(out)
        s.read.schema("doc_id BIGINT, source STRING, text STRING").json(out)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("text_chars"),
            // order-independent integer content checksum: md5-prefix of
            // each text summed per group — any mangled byte moves it
            sum(expr("CAST(conv(substring(md5(text), 1, 12), 16, 10) AS BIGINT)"))
              .as("text_checksum"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs,
                     CAST(SUM(length(text)) AS BIGINT) AS text_chars,
                     CAST(SUM(CAST('0x' || substr(md5(text), 1, 12) AS BIGINT)) AS BIGINT)
                       AS text_checksum
              FROM documents GROUP BY source ORDER BY source"""),
      doc = "JSONL write + declared-schema read round-trip == parquet-sourced " +
        "oracle (free-text escaping survives; no inference pass)"),

    // ---- Parquet AGGREGATE pushdown (DSv2): MIN/MAX/COUNT answered from
    // footer statistics — zero data pages read, the same footer stats the
    // lakehouse pruning uses, surfaced through the engine's own pushdown
    // rule. The builder routes this one read through the v2 path, asserts
    // `PushedAggregation` landed in the scan, collects the row UNDER that
    // plan, and restores both confs — session state is untouched for every
    // other query.
    GQuery("scan_agg_pushdown",
      (s, dir) => {
        val prevList = s.conf.get("spark.sql.sources.useV1SourceList")
        val prevPush = s.conf.get("spark.sql.parquet.aggregatePushdown")
        val row = try {
          s.conf.set("spark.sql.sources.useV1SourceList", "")
          s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
          val df = s.read.parquet(s"$dir/orders.parquet")
            .agg(min(col("o_orderkey")).as("min_key"),
              max(col("o_orderkey")).as("max_key"),
              count(lit(1)).as("n_rows"))
          val plan = df.queryExecution.executedPlan.toString
          require(plan.contains("PushedAggregation: [MIN(o_orderkey), " +
            "MAX(o_orderkey), COUNT(*)]"),
            s"aggregate pushdown did not reach the scan:\n$plan")
          df.collect().head
        } finally {
          s.conf.set("spark.sql.sources.useV1SourceList", prevList)
          s.conf.set("spark.sql.parquet.aggregatePushdown", prevPush)
        }
        import s.implicits._
        Seq((row.getLong(0), row.getLong(1), row.getLong(2)))
          .toDF("min_key", "max_key", "n_rows")
      },
      Some("""SELECT CAST(min(o_orderkey) AS BIGINT) AS min_key,
                     CAST(max(o_orderkey) AS BIGINT) AS max_key,
                     count(*) AS n_rows
              FROM orders"""),
      doc = "DSv2 parquet aggregate pushdown: MIN/MAX/COUNT served from footer " +
        "stats (PushedAggregation asserted in the scan; zero data pages)"),

    // ---- Materialized-view substitution through a user-provided Catalyst
    // rule: the registered aggregate materializes once, and the SAME
    // logical ask is then served from the parquet summary — the builder
    // asserts the served plan contains NO Aggregate (substitution fired),
    // and the oracle recomputes from the base table, proving the rewrite
    // result-transparent. Exact-match scope keeps it provably safe.
    GQuery("opt_materialized_rewrite",
      (s, dir) => {
        graft.plans.MaterializedViews.clear()
        def ask = Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
        graft.plans.MaterializedViews.register(s, "flag_qty", ask)
        val served = ask
        require(!served.queryExecution.optimizedPlan
          .exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]),
          "materialized-view substitution did not fire")
        served.orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
                     SUM(l_quantity) AS sum_qty,
                     count(*) AS n_items
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "materialized-view substitution (extraOptimizations rule, " +
        "exact canonical-plan match): the repeated aggregate is served from " +
        "the parquet summary — no Aggregate in the served plan — yet equals " +
        "the base-table oracle"),

    // ---- Corrupt-FILE resilience (the file-level sibling of
    // o16_bad_records' row-level PERMISSIVE parse): a landing zone with a
    // planted garbage member is read under ignoreCorruptFiles — the scan
    // skips the unreadable file and the census equals the good subset,
    // instead of 100 TB of backfill dying on one truncated upload. The
    // option is scoped to this read, never session-wide.
    GQuery("scan_ignore_corrupt_files",
      (s, dir) => {
        val out = graft.stages.TempDirs.scratch("graft_corrupt_")
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus").as("status"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("cents"))
        o.filter(col("o_orderkey") % 2 === 0)
          .write.mode("overwrite").parquet(out + "/zone")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out + "/zone", "part-junk.parquet"),
          "this is not a parquet file".getBytes("UTF-8"))
        s.read.option("ignoreCorruptFiles", "true").parquet(out + "/zone")
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
          .orderBy(col("status"))
      },
      Some("""SELECT o_orderstatus AS status, count(*) AS n_rows,
                     CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_cents
              FROM orders WHERE o_orderkey % 2 = 0
              GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      doc = "ignoreCorruptFiles scan: a planted garbage file is skipped, the " +
        "census equals the good subset (file-level resilience, read-scoped)"),

    // ---- Bloom FPR census: geometry (m=65536, k=3), md5 positions, a
    // DISJOINT probe set — the measured false-pass + fill table that
    // tunes BloomJoin.prune's mBits before it ships (a saturated filter
    // reads fpr→10000 here instead of silently shuffling everything).
    GQuery("sketch_bloom_fpr",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        graft.ops.Sketch.bloomFprCensus(
          o.filter(col("o_orderkey") % 2 === 0),
          o.filter(col("o_orderkey") % 2 === 1),
          "o_orderkey", mBits = 65536, k = 3)
      },
      Some("""WITH bk AS (SELECT DISTINCT o_orderkey AS key FROM orders WHERE o_orderkey % 2 = 0),
                   pk AS (SELECT DISTINCT o_orderkey AS key FROM orders WHERE o_orderkey % 2 = 1),
                   bp AS (SELECT DISTINCT
                            CAST('0x' || substr(md5(CAST(key AS VARCHAR) || '_' || CAST(j.j AS VARCHAR)), 1, 12) AS BIGINT) % 65536 AS pos
                          FROM bk, (SELECT unnest(range(0, 3)) AS j) j),
                   pp AS (SELECT key,
                            CAST('0x' || substr(md5(CAST(key AS VARCHAR) || '_' || CAST(j.j AS VARCHAR)), 1, 12) AS BIGINT) % 65536 AS pos
                          FROM pk, (SELECT unnest(range(0, 3)) AS j) j),
                   rejected AS (SELECT DISTINCT key FROM pp
                                WHERE pos NOT IN (SELECT pos FROM bp)),
                   c AS (SELECT (SELECT count(*) FROM bk) AS n_build,
                                (SELECT count(*) FROM pk) AS n_probe,
                                (SELECT count(*) FROM bp) AS n_bits_set,
                                (SELECT count(*) FROM rejected) AS n_rejected)
              SELECT n_build, n_probe, n_bits_set,
                     CAST(n_probe - n_rejected AS BIGINT) AS n_false_pass,
                     CAST((n_probe - n_rejected) * 10000 // n_probe AS BIGINT) AS fpr_per_10k,
                     CAST(n_bits_set * 10000 // 65536 AS BIGINT) AS fill_per_10k
              FROM c"""),
      doc = "measured Bloom false-positive census (m=65536, k=3, md5 positions, " +
        "disjoint probes): exact integer fpr + fill — the mBits tuning table"),

    // ---- Schema-merge scan: two parquet epochs with DIFFERENT schemas
    // (a column added mid-stream — the normal life of a landing zone) read
    // as ONE relation via mergeSchema; the old epoch's missing column
    // surfaces as NULL, counted and summed to prove nothing is dropped or
    // fabricated. mergeSchema costs a footer read per file, which is why
    // it is an explicit option — the census proves the semantic part.
    GQuery("scan_schema_merge",
      (s, dir) => {
        val out = graft.stages.TempDirs.scratch("graft_schemamerge_")
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_orderstatus").as("status"))
          .write.mode("overwrite").parquet(out + "/epoch1")
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_orderstatus").as("status"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("cents"))
          .write.mode("overwrite").parquet(out + "/epoch2")
        s.read.option("mergeSchema", "true")
          .parquet(out + "/epoch1", out + "/epoch2")
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("cents")).as("n_with_cents"),
            sum(col("cents")).as("sum_cents"))
          .orderBy(col("status"))
      },
      Some("""WITH u AS (
                SELECT o_orderkey, o_orderstatus AS status, CAST(NULL AS BIGINT) AS cents
                FROM orders WHERE o_orderkey % 2 = 0
                UNION ALL
                SELECT o_orderkey, o_orderstatus,
                       CAST(floor(o_totalprice * 100) AS BIGINT)
                FROM orders WHERE o_orderkey % 2 = 1)
              SELECT status, count(*) AS n_rows,
                     count(cents) AS n_with_cents,
                     CAST(SUM(cents) AS BIGINT) AS sum_cents
              FROM u GROUP BY status ORDER BY status"""),
      doc = "mergeSchema read across two parquet epochs (column added " +
        "mid-stream): NULL backfill censused == declarative union oracle"),

    // ---- Spark 4 VariantType: the modern semi-structured path (binary
    // variant encoding + typed path extraction) over the events props JSON —
    // parse once with parse_json, extract with variant_get (typed) and
    // try_variant_get (absent path → NULL, no error). The oracle reads the
    // same fields with DuckDB's JSON functions — variant encoding must be
    // value-transparent.
    GQuery("o18_variant_json",
      (s, dir) => Tables.events(s, dir)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'int')").as("k"),
          expr("try_variant_get(v, '$.absent', 'string')").as("absent"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("k").cast("bigint")).as("sum_k"),
          count(col("absent")).as("n_absent_hits"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n_events,
                     CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
                     CAST(COUNT(json_extract_string(props, '$.absent')) AS BIGINT) AS n_absent_hits
              FROM events GROUP BY event_type ORDER BY event_type"""),
      doc = "O1 modern form: VariantType parse_json + typed variant_get paths " +
        "(absent path NULL-safe) == DuckDB JSON extraction"),

    // ---- KMV set operations (ops/Sketch.kmvSetOps): |A∪B| / Jaccard /
    // |A∩B| estimated from two O(k) sketches alone (the theta-sketch
    // capability) — here the 'view' vs 'purchase' user audiences — with
    // the exact values alongside as the accuracy report.
    GQuery("sketch_kmv_setops",
      (s, dir) => graft.ops.Sketch.kmvSetOps(
        Tables.events(s, dir), "event_type", "user_id",
        groupA = "view", groupB = "purchase", k = 64),
      Some("""WITH hashed AS (
                SELECT DISTINCT event_type AS g, user_id AS v,
                       CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
                FROM events WHERE event_type IN ('view', 'purchase')),
              sk AS (
                SELECT g, h FROM (
                  SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS r
                  FROM hashed) WHERE r <= 64),
              uk AS (
                SELECT h, r FROM (
                  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r
                  FROM (SELECT DISTINCT h FROM sk)) WHERE r <= 64),
              m AS (
                SELECT max(CASE WHEN uk.r = 64 THEN uk.h END) AS kth_min_hash,
                       count(*) AS sketch_size,
                       CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
                FROM uk
                LEFT JOIN (SELECT h FROM sk WHERE g = 'view') a ON a.h = uk.h
                LEFT JOIN (SELECT h FROM sk WHERE g = 'purchase') b ON b.h = uk.h),
              x AS (
                SELECT count(*) AS exact_union,
                       count(CASE WHEN ng = 2 THEN 1 END) AS exact_intersection
                FROM (SELECT v, count(DISTINCT g) AS ng FROM hashed GROUP BY v))
              SELECT m.sketch_size, m.n_shared,
                     CASE WHEN m.kth_min_hash IS NULL THEN CAST(m.sketch_size AS DOUBLE)
                          ELSE 63.0 / (m.kth_min_hash / POWER(2.0, 60)) END AS est_union,
                     CAST(m.n_shared AS DOUBLE) / m.sketch_size AS est_jaccard,
                     (CAST(m.n_shared AS DOUBLE) / m.sketch_size) *
                       (CASE WHEN m.kth_min_hash IS NULL THEN CAST(m.sketch_size AS DOUBLE)
                             ELSE 63.0 / (m.kth_min_hash / POWER(2.0, 60)) END) AS est_intersection,
                     x.exact_union, x.exact_intersection
              FROM m, x"""),
      doc = "KMV set operations: union/Jaccard/intersection estimated from two O(k) " +
        "sketches (theta-sketch capability) with exact values as the accuracy report"),

    // ---- Join-size estimation from a bottom-k key sample: the
    // cardinality question a cost-based planner asks before choosing a
    // join strategy — |A ⋈ B| = Σ_v cntA(v)·cntB(v), estimated by
    // scaling the sampled multiplicity products by D̂/k (the KMV sample
    // is uniform over distinct keys; D̂ is the KMV distinct estimate).
    // One conditional-count aggregate is the only corpus-scale work;
    // exact join size alongside as the accuracy report.
    GQuery("sketch_join_size_estimate",
      (s, dir) => graft.ops.Sketch.joinSizeEstimate(
        Tables.events(s, dir), "event_type", "user_id",
        groupA = "view", groupB = "purchase", k = 64),
      Some("""WITH cnts AS (
             |  SELECT user_id AS v,
             |         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cb,
             |         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
             |  FROM events WHERE event_type IN ('view', 'purchase')
             |  GROUP BY user_id),
             |smp AS (
             |  SELECT max(CASE WHEN r = 64 THEN h END) AS kth_min_hash,
             |         CAST(count(*) AS BIGINT) AS sample_size,
             |         CAST(SUM(ca * cb) AS BIGINT) AS sample_join_rows
             |  FROM (SELECT h, ca, cb, ROW_NUMBER() OVER (ORDER BY h) AS r
             |        FROM cnts) WHERE r <= 64),
             |x AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct_keys,
             |             CAST(SUM(ca * cb) AS BIGINT) AS exact_join_size
             |      FROM cnts)
             |SELECT smp.sample_size, smp.sample_join_rows,
             |       CASE WHEN smp.kth_min_hash IS NULL
             |            THEN CAST(smp.sample_size AS DOUBLE)
             |            ELSE 63.0 / (smp.kth_min_hash / POWER(2.0, 60)) END
             |         AS est_distinct_keys,
             |       (CAST(smp.sample_join_rows AS DOUBLE) / CAST(smp.sample_size AS DOUBLE))
             |         * (CASE WHEN smp.kth_min_hash IS NULL
             |                 THEN CAST(smp.sample_size AS DOUBLE)
             |                 ELSE 63.0 / (smp.kth_min_hash / POWER(2.0, 60)) END)
             |         AS est_join_size,
             |       x.exact_distinct_keys, x.exact_join_size
             |FROM smp, x""".stripMargin),
      doc = "join-size estimate from a bottom-64 key sample: sampled " +
        "multiplicity products scaled by the KMV distinct estimate " +
        "(end-biased sampling) vs the exact join cardinality — the " +
        "planner's cardinality question as a priced card"),

    // ---- partition-pruned scan: the 100 TB layout claim made checkable.
    // Facts land PARTITIONED by their natural time key (the
    // date-partitioned STG layout ARCHITECTURE.md prescribes); a
    // month-restricted query then reads ONLY that month's directories —
    // the predicate resolves at the FILE INDEX, before any footer or row
    // is touched. PlanAuditSpec pins the PartitionFilters plan fragment.
    GQuery("scan_partition_pruning",
      (s, dir) => {
        val out = graft.stages.TempDirs.scratch("graft_partprune_")
        Tables.events(s, dir)
          .withColumn("event_month", month(col("ts")))
          .write.partitionBy("event_month").mode("overwrite").parquet(out)
        s.read.parquet(out)
          .filter(col("event_month") === 1)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM events WHERE month(ts) = 1
              GROUP BY user_id ORDER BY user_id"""),
      doc = "time-partitioned fact layout + month-restricted read: the predicate " +
        "prunes whole partition directories at the file index (PartitionFilters)"),

    // ---- DYNAMIC partition pruning: the pruning predicate is not in the
    // query at all — it arrives through a dim join at RUNTIME. The fact
    // side is partitioned on the join key; the dim side carries the
    // selective filter (quarter = 1), which no static rule can push to the
    // fact scan. Catalyst plants a DynamicPruningSubquery on the fact's
    // partition column that REUSES the dim's broadcast exchange, so whole
    // fact partition directories are skipped per the dim rows that
    // actually survive — the mechanism that makes star-schema queries
    // over a date-partitioned 100 TB fact read only the quarter they
    // touch. PlanAuditSpec pins `dynamicpruningexpression` in
    // PartitionFilters.
    GQuery("scan_dynamic_partition_pruning",
      (s, dir) => {
        val out = graft.stages.TempDirs.scratch("graft_dpp_")
        // the testdata corpus is one calendar month, so DAY is its natural
        // partition grain (30 directories); at production scale the same
        // shape is date-partitioned years of data
        Tables.events(s, dir)
          .withColumn("event_day", dayofmonth(col("ts")))
          .write.partitionBy("event_day").mode("overwrite").parquet(out)
        val dayDim = s.range(1, 32)
          .select(col("id").cast("int").as("event_day"),
            (((col("id") - 1) / 7) + 1).cast("int").as("week_of_month"))
        s.read.parquet(out)
          .join(broadcast(dayDim.filter(col("week_of_month") === 2)), Seq("event_day"))
          .groupBy(col("event_day"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
          .orderBy(col("event_day"))
      },
      Some("""SELECT dayofmonth(ts) AS event_day, count(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM events WHERE dayofmonth(ts) BETWEEN 8 AND 14
              GROUP BY event_day ORDER BY event_day"""),
      doc = "join-driven dynamic partition pruning: the week filter lives on the " +
        "day-dim side only; a DynamicPruningSubquery reusing the dim broadcast " +
        "prunes 23 of 30 fact partition directories at runtime"),

    // ---- BFS hop distances from a sparse seed set over the same irregular
    // undirected graph as the triangle census (+1/+2/+3/x2 chords): the
    // seed-expansion primitive behind "documents within k link-hops of a
    // trusted set" curation. Four Pregel-style rounds — per round one
    // node-keyed join + one min-agg, lineage cut per round; the oracle
    // unrolls the identical monotone relaxation (distances are small ints,
    // exact on both engines). Census over hop distance, -1 = unreached.
    GQuery("graph_bfs_hops",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val und = graft.ops.GraphOps.chordGraph(nodes)
        val seeds = nodes.filter(col("node") % 97 === 0)
        val dist = graft.ops.GraphOps.bfsHops(seeds, und, rounds = 4)
        nodes.join(dist, Seq("node"), "left")
          .select(coalesce(col("dist"), lit(-1)).as("dist"))
          .groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
          .orderBy(col("dist"))
      },
      Some("""WITH nodes AS (SELECT c_custkey AS node FROM customer),
              und AS (
                SELECT DISTINCT a, b FROM (
                  SELECT node AS a, node + 1 AS b FROM nodes
                  UNION ALL SELECT node, node + 2 FROM nodes
                  UNION ALL SELECT node, node + 3 FROM nodes
                  UNION ALL SELECT node, node * 2 FROM nodes) e
                WHERE a < b
                  AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
              adj AS (SELECT a AS u, b AS v FROM und
                      UNION ALL SELECT b, a FROM und),
              d0 AS (SELECT node, 0 AS dist FROM nodes WHERE node % 97 = 0),
              d1 AS (SELECT node, min(dist) AS dist FROM (
                       SELECT node, dist FROM d0
                       UNION ALL
                       SELECT adj.v, d0.dist + 1 FROM adj JOIN d0 ON adj.u = d0.node)
                     GROUP BY node),
              d2 AS (SELECT node, min(dist) AS dist FROM (
                       SELECT node, dist FROM d1
                       UNION ALL
                       SELECT adj.v, d1.dist + 1 FROM adj JOIN d1 ON adj.u = d1.node)
                     GROUP BY node),
              d3 AS (SELECT node, min(dist) AS dist FROM (
                       SELECT node, dist FROM d2
                       UNION ALL
                       SELECT adj.v, d2.dist + 1 FROM adj JOIN d2 ON adj.u = d2.node)
                     GROUP BY node),
              d4 AS (SELECT node, min(dist) AS dist FROM (
                       SELECT node, dist FROM d3
                       UNION ALL
                       SELECT adj.v, d3.dist + 1 FROM adj JOIN d3 ON adj.u = d3.node)
                     GROUP BY node)
              SELECT CAST(COALESCE(d.dist, -1) AS INT) AS dist,
                     count(*) AS n_nodes
              FROM nodes n LEFT JOIN d4 d USING (node)
              GROUP BY 1 ORDER BY dist"""),
      doc = "BFS hop distances from a seed set (4 Pregel rounds: join + min-agg " +
        "per round, lineage cut) == unrolled monotone-relaxation oracle; " +
        "hop-distance census with -1 for unreached"),

    // ---- Weighted single-source shortest paths: bounded-round
    // Bellman-Ford over the same deterministic customer-key graph with
    // integer weights w = 1 + (a+b) % 7 — graph_bfs_hops' weighted
    // sibling (identical per-round join + min-agg shape; exact integer
    // distances on both engines; the oracle unrolls the same monotone
    // relaxation, so the ≤4-edge truncation is part of the contract).
    GQuery("graph_sssp_weighted",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val und = graft.ops.GraphOps.chordGraph(nodes)
          .withColumn("w", (col("a") + col("b")) % 7 + 1)
        val seeds = nodes.filter(col("node") % 97 === 0)
        val dist = graft.ops.GraphOps.ssspWeighted(seeds, und, rounds = 4)
        nodes.join(dist, Seq("node"), "left")
          .select(coalesce(col("dist"), lit(-1L)).as("dist"))
          .groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
          .orderBy(col("dist"))
      },
      Some("""WITH nodes AS (SELECT c_custkey AS node FROM customer),
              und AS (
                SELECT a, b, (a + b) % 7 + 1 AS w FROM (
                  SELECT DISTINCT a, b FROM (
                    SELECT node AS a, node + 1 AS b FROM nodes
                    UNION ALL SELECT node, node + 2 FROM nodes
                    UNION ALL SELECT node, node + 3 FROM nodes
                    UNION ALL SELECT node, node * 2 FROM nodes) e
                  WHERE a < b
                    AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b))),
              adj AS (SELECT a AS u, b AS v, w FROM und
                      UNION ALL SELECT b, a, w FROM und),
              d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes WHERE node % 97 = 0),
              d1 AS (SELECT node, min(dist) AS dist FROM (
                       SELECT node, dist FROM d0
                       UNION ALL
                       SELECT adj.v, d0.dist + adj.w FROM adj JOIN d0 ON adj.u = d0.node)
                     GROUP BY node),
              d2 AS (SELECT node, min(dist) AS dist FROM (
                       SELECT node, dist FROM d1
                       UNION ALL
                       SELECT adj.v, d1.dist + adj.w FROM adj JOIN d1 ON adj.u = d1.node)
                     GROUP BY node),
              d3 AS (SELECT node, min(dist) AS dist FROM (
                       SELECT node, dist FROM d2
                       UNION ALL
                       SELECT adj.v, d2.dist + adj.w FROM adj JOIN d2 ON adj.u = d2.node)
                     GROUP BY node),
              d4 AS (SELECT node, min(dist) AS dist FROM (
                       SELECT node, dist FROM d3
                       UNION ALL
                       SELECT adj.v, d3.dist + adj.w FROM adj JOIN d3 ON adj.u = d3.node)
                     GROUP BY node)
              SELECT CAST(COALESCE(d.dist, -1) AS BIGINT) AS dist,
                     count(*) AS n_nodes
              FROM nodes n LEFT JOIN d4 d USING (node)
              GROUP BY 1 ORDER BY dist"""),
      doc = "weighted SSSP: 4 Bellman-Ford rounds (join + min-agg, lineage cut) " +
        "over integer weights == unrolled relaxation oracle; distance census"),

    // ---- Shard-topology rebalance census: when a sharded corpus grows
    // from 8 to 10 nodes, rendezvous (highest-random-weight) hashing —
    // shard = argmax over nodes of md5(node : doc) — moves only the docs
    // the NEW nodes win (~2/10), while naive doc_id % n reassigns almost
    // everything (the full-reshuffle failure mode of modular sharding).
    // Pure per-row md5 integer arithmetic + one census aggregate, so the
    // movement table is exact cross-engine; ties in 60-bit weights are
    // broken by first-position (never observed, still deterministic).
    GQuery("prep_rebalance_census",
      (s, dir) => {
        def w(k: Int) =
          s"CAST(conv(substring(md5(concat('node$k:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        def hrw(n: Int) = {
          val arr = (0 until n).map(w).mkString(", ")
          s"array_position(array($arr), array_max(array($arr))) - 1"
        }
        val r = Tables.documents(s, dir).select(col("doc_id"))
          .withColumn("mod_old", col("doc_id") % 8)
          .withColumn("mod_new", col("doc_id") % 10)
          .withColumn("hrw_old", expr(hrw(8)))
          .withColumn("hrw_new", expr(hrw(10)))
        r.select(lit("mod").as("method"),
            (col("mod_old") =!= col("mod_new")).as("moved"))
          .unionByName(r.select(lit("rendezvous").as("method"),
            (col("hrw_old") =!= col("hrw_new")).as("moved")))
          .groupBy(col("method"))
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("moved"), 1)).as("n_moved"))
          .withColumn("moved_per_10k", expr("n_moved * 10000 div n_docs"))
          .orderBy(col("method"))
      },
      Some("""WITH w AS (
                SELECT doc_id,
                       list_transform(range(0, 10), k ->
                         CAST('0x' || substr(md5('node' || CAST(k AS VARCHAR)
                           || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)) AS ws
                FROM documents),
              a AS (
                SELECT doc_id,
                       list_position(ws[1:8], list_max(ws[1:8])) - 1 AS hrw_old,
                       list_position(ws, list_max(ws)) - 1 AS hrw_new,
                       doc_id % 8 AS mod_old, doc_id % 10 AS mod_new
                FROM w),
              u AS (
                SELECT 'mod' AS method, mod_old <> mod_new AS moved FROM a
                UNION ALL
                SELECT 'rendezvous', hrw_old <> hrw_new FROM a)
              SELECT method, count(*) AS n_docs,
                     CAST(count(*) FILTER (moved) AS BIGINT) AS n_moved,
                     count(*) FILTER (moved) * 10000 // count(*) AS moved_per_10k
              FROM u GROUP BY method ORDER BY method"""),
      doc = "rendezvous (HRW) vs modular sharding under an 8 -> 10 node " +
        "topology change: exact md5-argmax movement census — consistent " +
        "hashing moves ~2/10 of the corpus, mod moves ~9/10"),

    // ---- Label-propagation communities over a block star+path graph
    // (blocks of 10 customer keys: path k—k+1 within the block plus a
    // star from the block head). Round 1 is the all-ties min-label path;
    // rounds 2-3 exercise the FREQUENCY argmax (head labels reach count
    // 2-3), so both halves of the vote are oracle-covered. Deterministic
    // synchronous LPA: most-frequent neighbor label, smallest label on
    // ties, bounded rounds — the community-size table is the surface.
    GQuery("graph_label_propagation",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val path = nodes.filter(col("node") % 10 =!= 0)
          .select(col("node").as("a"), (col("node") + 1).as("b"))
        val star = nodes
          .select(expr("((node - 1) div 10) * 10 + 1").as("a"), col("node").as("b"))
          .filter(col("a") =!= col("b"))
        val und = path.unionByName(star).distinct()
          .join(nodes.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
          .join(nodes.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
        graft.ops.GraphOps.labelPropagation(nodes, und, rounds = 3)
          .groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
          .orderBy(col("label"))
      },
      Some {
        val rounds = (1 to 3).map { r =>
          s"""v$r AS (SELECT t.node, -(max({'c': t.cnt, 'k': -t.lbl}).k) AS new_label
                      FROM (SELECT nb.node AS node, l.label AS lbl, count(*) AS cnt
                            FROM nbrs nb JOIN l${r - 1} l ON l.node = nb.nbr
                            GROUP BY nb.node, l.label) t
                      GROUP BY t.node),
              l$r AS (SELECT n.node, CAST(COALESCE(v.new_label, n.label) AS BIGINT) AS label
                      FROM l${r - 1} n LEFT JOIN v$r v USING (node))"""
        }.mkString(",\n")
        s"""WITH nodes AS (SELECT c_custkey AS node FROM customer),
            cand AS (
              SELECT node AS a, node + 1 AS b FROM nodes WHERE node % 10 <> 0
              UNION
              SELECT ((node - 1) // 10) * 10 + 1 AS a, node AS b FROM nodes
               WHERE ((node - 1) // 10) * 10 + 1 <> node),
            und AS (SELECT a, b FROM cand e
                    WHERE EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.a)
                      AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
            nbrs AS (SELECT a AS node, b AS nbr FROM und
                     UNION ALL SELECT b AS node, a AS nbr FROM und),
            l0 AS (SELECT node, node AS label FROM nodes),
            $rounds
            SELECT label, count(*) AS n_nodes FROM l3
            GROUP BY label ORDER BY label"""
      },
      doc = "synchronous label-propagation communities (3 exact rounds, " +
        "most-frequent neighbor label, min-label ties): per-community size table"),

    // ---- Modularity census of the LP communities (Newman's Q, the
    // number community detection is graded by): per community, the exact
    // integer contribution ⌊10⁶·(4m·L_c − d_c²)/4m²⌋ — L_c = intra
    // edges, d_c = degree sum, m = edge count. Same fixture graph and
    // the identical 3-round LP as graph_label_propagation, so the census
    // prices exactly the partition that query ships. Two passes over the
    // edge list (degree agg + label-joined intra count), nothing
    // quadratic.
    GQuery("graph_modularity_census",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val path = nodes.filter(col("node") % 10 =!= 0)
          .select(col("node").as("a"), (col("node") + 1).as("b"))
        val star = nodes
          .select(expr("((node - 1) div 10) * 10 + 1").as("a"), col("node").as("b"))
          .filter(col("a") =!= col("b"))
        val und = path.unionByName(star).distinct()
          .join(nodes.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
          .join(nodes.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
          .localCheckpoint(true) // referenced by degree, intra, and m branches
        val labels = graft.ops.GraphOps.labelPropagation(nodes, und, rounds = 3)
          .localCheckpoint(true)
        graft.ops.GraphOps.modularityCensus(und, labels)
          .orderBy(col("label"))
      },
      Some {
        val rounds = (1 to 3).map { r =>
          s"""v$r AS (SELECT t.node, -(max({'c': t.cnt, 'k': -t.lbl}).k) AS new_label
                      FROM (SELECT nb.node AS node, l.label AS lbl, count(*) AS cnt
                            FROM nbrs nb JOIN l${r - 1} l ON l.node = nb.nbr
                            GROUP BY nb.node, l.label) t
                      GROUP BY t.node),
              l$r AS (SELECT n.node, CAST(COALESCE(v.new_label, n.label) AS BIGINT) AS label
                      FROM l${r - 1} n LEFT JOIN v$r v USING (node))"""
        }.mkString(",\n")
        s"""WITH nodes AS (SELECT c_custkey AS node FROM customer),
            cand AS (
              SELECT node AS a, node + 1 AS b FROM nodes WHERE node % 10 <> 0
              UNION
              SELECT ((node - 1) // 10) * 10 + 1 AS a, node AS b FROM nodes
               WHERE ((node - 1) // 10) * 10 + 1 <> node),
            und AS (SELECT a, b FROM cand e
                    WHERE EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.a)
                      AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
            nbrs AS (SELECT a AS node, b AS nbr FROM und
                     UNION ALL SELECT b AS node, a AS nbr FROM und),
            l0 AS (SELECT node, node AS label FROM nodes),
            $rounds,
            deg AS (SELECT node, count(*) AS deg FROM nbrs GROUP BY node),
            m AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM und),
            byc AS (SELECT l.label, count(*) AS n_nodes,
                           CAST(SUM(d.deg) AS BIGINT) AS degree_sum
                    FROM l3 l JOIN deg d USING (node) GROUP BY l.label),
            intra AS (SELECT la.label, count(*) AS intra_edges
                      FROM und e JOIN l3 la ON la.node = e.a
                                 JOIN l3 lb ON lb.node = e.b
                      WHERE la.label = lb.label GROUP BY la.label),
            r AS (SELECT b.label, b.n_nodes, b.degree_sum,
                         CAST(COALESCE(i.intra_edges, 0) AS BIGINT) AS intra_edges,
                         m.m_edges,
                         1000000 * (4 * CAST(m.m_edges AS HUGEINT) * CAST(COALESCE(i.intra_edges, 0) AS BIGINT)
                           - CAST(b.degree_sum AS HUGEINT) * b.degree_sum) AS num,
                         4 * CAST(m.m_edges AS HUGEINT) * m.m_edges AS den
                  FROM byc b LEFT JOIN intra i USING (label), m)
            SELECT label, n_nodes, degree_sum, intra_edges, m_edges,
                   CAST(CASE WHEN num < 0 THEN -((-num) // den)
                             ELSE num // den END AS BIGINT) AS contrib_e6
            FROM r ORDER BY label"""
      },
      doc = "modularity census of the LP communities: exact-integer " +
        "per-community Newman-Q contributions (4m·L_c − d_c² over 4m², " +
        "floored at 1e6) — degree agg + label-joined intra-edge count, " +
        "two edge-list passes"),

    // ---- Conductance census: modularity's DUAL view — per community,
    // cut/min(vol, 2m−vol) at 1e6 (low = well-separated). Same LP
    // partition and fixture graph as graph_modularity_census, so the
    // two cards grade the identical communities from the density and
    // the cut side. Cut edges count toward both endpoint communities.
    GQuery("graph_conductance_census",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val path = nodes.filter(col("node") % 10 =!= 0)
          .select(col("node").as("a"), (col("node") + 1).as("b"))
        val star = nodes
          .select(expr("((node - 1) div 10) * 10 + 1").as("a"), col("node").as("b"))
          .filter(col("a") =!= col("b"))
        val und = path.unionByName(star).distinct()
          .join(nodes.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
          .join(nodes.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
          .localCheckpoint(true)
        val labels = graft.ops.GraphOps.labelPropagation(nodes, und, rounds = 3)
          .localCheckpoint(true)
        graft.ops.GraphOps.conductanceCensus(und, labels)
          .orderBy(col("label"))
      },
      Some {
        val rounds = (1 to 3).map { r =>
          s"""v$r AS (SELECT t.node, -(max({'c': t.cnt, 'k': -t.lbl}).k) AS new_label
                      FROM (SELECT nb.node AS node, l.label AS lbl, count(*) AS cnt
                            FROM nbrs nb JOIN l${r - 1} l ON l.node = nb.nbr
                            GROUP BY nb.node, l.label) t
                      GROUP BY t.node),
              l$r AS (SELECT n.node, CAST(COALESCE(v.new_label, n.label) AS BIGINT) AS label
                      FROM l${r - 1} n LEFT JOIN v$r v USING (node))"""
        }.mkString(",\n")
        s"""WITH nodes AS (SELECT c_custkey AS node FROM customer),
            cand AS (
              SELECT node AS a, node + 1 AS b FROM nodes WHERE node % 10 <> 0
              UNION
              SELECT ((node - 1) // 10) * 10 + 1 AS a, node AS b FROM nodes
               WHERE ((node - 1) // 10) * 10 + 1 <> node),
            und AS (SELECT a, b FROM cand e
                    WHERE EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.a)
                      AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
            nbrs AS (SELECT a AS node, b AS nbr FROM und
                     UNION ALL SELECT b AS node, a AS nbr FROM und),
            l0 AS (SELECT node, node AS label FROM nodes),
            $rounds,
            deg AS (SELECT node, count(*) AS deg FROM nbrs GROUP BY node),
            m AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM und),
            byc AS (SELECT l.label, count(*) AS n_nodes,
                           CAST(SUM(d.deg) AS BIGINT) AS vol
                    FROM l3 l JOIN deg d USING (node) GROUP BY l.label),
            sided AS (SELECT la.label AS la, lb.label AS lb
                      FROM und e JOIN l3 la ON la.node = e.a
                                 JOIN l3 lb ON lb.node = e.b
                      WHERE la.label <> lb.label),
            cut AS (SELECT label, CAST(count(*) AS BIGINT) AS cut_edges FROM (
                      SELECT la AS label FROM sided
                      UNION ALL SELECT lb AS label FROM sided)
                    GROUP BY label),
            r AS (SELECT b.label, b.n_nodes, b.vol,
                         CAST(COALESCE(c.cut_edges, 0) AS BIGINT) AS cut_edges,
                         m.m_edges,
                         least(b.vol, 2 * m.m_edges - b.vol) AS den
                  FROM byc b LEFT JOIN cut c USING (label), m)
            SELECT label, n_nodes, vol, cut_edges, m_edges,
                   CAST(CASE WHEN den = 0 THEN 0
                             ELSE (1000000 * cut_edges) // den END AS BIGINT)
                     AS conductance_e6
            FROM r ORDER BY label"""
      },
      doc = "conductance census of the LP communities: exact-integer " +
        "cut/min(vol, 2m-vol) at 1e6 per community — the cut-quality " +
        "dual of the modularity card, same partition, same fixture"),

    // ---- Quantile-sketch quality report (the sim_recall_report
    // convention for order statistics): the bottom-64-by-hash sample's
    // p25/p50/p75/p90/p99 estimates, each graded by its EXACT achieved
    // rank in the full data — the measured error bar a planner consults
    // before trusting sampled percentiles for partition sizing. The only
    // corpus-scale work is one scan for totals and one broadcast-est
    // conditional count (5 rows/type); everything else is over the
    // 64-row-per-type sample.
    GQuery("sketch_quantile_error_report",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select(col("event_type"), col("event_id"), col("value"))
        val wPri = Window.partitionBy(col("event_type"))
          .orderBy(col("pri"), col("event_id"))
        val samp = ev.withColumn("pri", expr(
            "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
          .withColumn("r", row_number().over(wPri)).filter(col("r") <= 64)
        val wVal = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        val ranked = samp.withColumn("vr", row_number().over(wVal))
          .withColumn("ns",
            count(lit(1)).over(Window.partitionBy(col("event_type"))))
        val ps = Seq(25, 50, 75, 90, 99).toDF("pct")
        val est = ranked.crossJoin(broadcast(ps))
          .filter(col("vr") === expr("(pct * ns + 99) div 100"))
          .select(col("event_type"), col("pct"), col("value").as("est_value"))
        val tot = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_total"))
        ev.join(broadcast(est), Seq("event_type"))
          .groupBy(col("event_type"), col("pct"), col("est_value"))
          .agg(count(when(col("value") < col("est_value"), lit(1))).as("n_lt"))
          .join(broadcast(tot), Seq("event_type"))
          .select(col("event_type"), col("pct"), col("est_value"), col("n_lt"),
            expr("n_lt * 10000 div n_total").as("rank_e4"),
            expr("abs(n_lt * 10000 div n_total - pct * 100)").as("err_e4"))
          .orderBy(col("event_type"), col("pct"))
      },
      Some("""WITH pri AS (
                SELECT event_type, event_id, value,
                       CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS pri
                FROM events),
              samp AS (
                SELECT event_type, event_id, value FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY pri, event_id) AS r FROM pri)
                WHERE r <= 64),
              ranked AS (
                SELECT event_type, value,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                         ORDER BY value, event_id) AS vr,
                       COUNT(*) OVER (PARTITION BY event_type) AS ns
                FROM samp),
              ps AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct),
              est AS (
                SELECT r.event_type, p.pct, r.value AS est_value
                FROM ranked r, ps p WHERE r.vr = (p.pct * r.ns + 99) // 100),
              tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_total
                      FROM events GROUP BY 1),
              cnt AS (
                SELECT e.event_type, e.pct, e.est_value,
                       CAST(count(*) FILTER (ev.value < e.est_value) AS BIGINT) AS n_lt
                FROM est e JOIN events ev USING (event_type)
                GROUP BY 1, 2, 3)
              SELECT c.event_type, c.pct, c.est_value, c.n_lt,
                     c.n_lt * 10000 // t.n_total AS rank_e4,
                     abs(c.n_lt * 10000 // t.n_total - c.pct * 100) AS err_e4
              FROM cnt c JOIN tot t USING (event_type)
              ORDER BY c.event_type, c.pct"""),
      doc = "quantile-sketch error report: bottom-64-by-hash estimates at 5 " +
        "percentiles, graded by exact achieved rank (1e4 scale) in full data"),

    // ---- Link prediction by common neighbors + Jaccard — the "who
    // should be connected" score over the same chord graph the triangle
    // census walks. Wedge enumeration through shared middles (bounded by
    // the graph's max degree here; a power-law graph routes this through
    // the degree-ordered orientation exactly as trianglePerNode does),
    // existing edges anti-joined away, Jaccard as a 1e4-scaled exact
    // integer; deterministic top-20 cut.
    GQuery("graph_link_prediction",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val und = graft.ops.GraphOps.chordGraph(nodes)
        val nbrs = und.select(col("a").as("node"), col("b").as("nbr"))
          .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
        val deg = nbrs.groupBy(col("node")).agg(count(lit(1)).as("deg"))
        val common = nbrs.select(col("node").as("mid"), col("nbr").as("u"))
          .join(nbrs.select(col("node").as("mid"), col("nbr").as("v")), Seq("mid"))
          .filter(col("u") < col("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n_common"))
        common
          .join(und.select(col("a").as("u"), col("b").as("v")),
            Seq("u", "v"), "left_anti")
          .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
          .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
          .withColumn("jaccard_e4",
            expr("n_common * 10000 div (du + dv - n_common)"))
          .select(col("u"), col("v"), col("n_common"), col("jaccard_e4"))
          .orderBy(col("jaccard_e4").desc, col("u"), col("v"))
          .limit(20)
      },
      Some("""WITH nodes AS (SELECT c_custkey AS node FROM customer),
              und AS (
                SELECT DISTINCT a, b FROM (
                  SELECT node AS a, node + 1 AS b FROM nodes
                  UNION ALL SELECT node, node + 2 FROM nodes
                  UNION ALL SELECT node, node + 3 FROM nodes
                  UNION ALL SELECT node, node * 2 FROM nodes) e
                WHERE a < b
                  AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
              nbrs AS (SELECT a AS node, b AS nbr FROM und
                       UNION ALL SELECT b, a FROM und),
              deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
                      FROM nbrs GROUP BY node),
              com AS (
                SELECT x.nbr AS u, y.nbr AS v, CAST(count(*) AS BIGINT) AS n_common
                FROM nbrs x JOIN nbrs y ON x.node = y.node AND x.nbr < y.nbr
                GROUP BY 1, 2),
              ne AS (
                SELECT c.u, c.v, c.n_common FROM com c
                WHERE NOT EXISTS (SELECT 1 FROM und e
                                  WHERE e.a = c.u AND e.b = c.v))
              SELECT ne.u, ne.v, ne.n_common,
                     ne.n_common * 10000 // (da.deg + db.deg - ne.n_common) AS jaccard_e4
              FROM ne JOIN deg da ON da.node = ne.u
                      JOIN deg db ON db.node = ne.v
              ORDER BY jaccard_e4 DESC, ne.u, ne.v LIMIT 20"""),
      doc = "link prediction: common-neighbor wedge counts + exact 1e4 " +
        "Jaccard over non-edges, deterministic top-20 (orientation-bounded " +
        "wedges at power-law scale)"),

    // ---- Degree assortativity (Newman) — do hubs link to hubs? Pearson r
    // over the degree pairs of every edge end (each edge counted in both
    // directions, the standard convention). Exact decimal moments with the
    // agg_pearson_exact IEEE finish; degrees from one count, the edge
    // table joined twice (broadcastable degree side at any realistic
    // |nodes|... the DEGREE TABLE is |nodes| rows, not corpus rows).
    GQuery("graph_assortativity",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val und = graft.ops.GraphOps.chordGraph(nodes)
        val nbrs = und.select(col("a").as("node"), col("b").as("nbr"))
          .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
        val deg = nbrs.groupBy(col("node")).agg(count(lit(1)).as("deg"))
        nbrs
          .join(deg.select(col("node"), col("deg").cast("decimal(18,0)").as("x")),
            Seq("node"))
          .join(deg.select(col("node").as("nbr"),
            col("deg").cast("decimal(18,0)").as("y")), Seq("nbr"))
          .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("n").cast("long").as("n_edge_ends"),
            expr("CAST(n * sxy - sx * sy AS DOUBLE) " +
              "/ (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) " +
              "* sqrt(CAST(n * syy - sy * sy AS DOUBLE)))").as("assortativity"))
      },
      Some("""WITH nodes AS (SELECT c_custkey AS node FROM customer),
              und AS (
                SELECT DISTINCT a, b FROM (
                  SELECT node AS a, node + 1 AS b FROM nodes
                  UNION ALL SELECT node, node + 2 FROM nodes
                  UNION ALL SELECT node, node + 3 FROM nodes
                  UNION ALL SELECT node, node * 2 FROM nodes) e
                WHERE a < b
                  AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
              nbrs AS (SELECT a AS node, b AS nbr FROM und
                       UNION ALL SELECT b, a FROM und),
              deg AS (SELECT node, CAST(count(*) AS HUGEINT) AS deg
                      FROM nbrs GROUP BY node),
              m AS (
                SELECT CAST(count(*) AS HUGEINT) AS n,
                       SUM(dx.deg) AS sx, SUM(dy.deg) AS sy,
                       SUM(dx.deg * dy.deg) AS sxy,
                       SUM(dx.deg * dx.deg) AS sxx,
                       SUM(dy.deg * dy.deg) AS syy
                FROM nbrs e JOIN deg dx ON dx.node = e.node
                            JOIN deg dy ON dy.node = e.nbr)
              SELECT CAST(n AS BIGINT) AS n_edge_ends,
                     CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS assortativity
              FROM m"""),
      doc = "Newman degree assortativity: Pearson over per-edge-end degree " +
        "pairs (both directions), exact decimal moments, IEEE finish"),

    // ---- Global clustering coefficient: C = 3·triangles / wedges with
    // BOTH counts exact integers — Σ per-node triangle participation is
    // 3T by construction (each triangle counted at its three corners),
    // wedges = Σ deg·(deg−1)/2 from the degree table. Triangle side rides
    // the degree-ordered orientation (O(√m) fan-out); one double division
    // at the end.
    GQuery("graph_clustering_coefficient",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val und = graft.ops.GraphOps.chordGraph(nodes)
        val tri3 = graft.ops.GraphOps.trianglePerNode(nodes, und)
          .agg(sum(col("tri_count")).as("tri_x3"))
        val wedges = und
          .select(explode(array(col("a"), col("b"))).as("node"))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          .agg(sum(expr("deg * (deg - 1) div 2")).as("n_wedges"),
            count(lit(1)).as("n_nodes"))
        val edges = und.agg(count(lit(1)).as("n_edges"))
        wedges.crossJoin(broadcast(tri3)).crossJoin(broadcast(edges))
          .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("tri_x3"),
            (col("tri_x3").cast("double") / col("n_wedges")).as("global_cc"))
      },
      Some("""WITH nodes AS (SELECT c_custkey AS node FROM customer),
              und AS (
                SELECT DISTINCT a, b FROM (
                  SELECT node AS a, node + 1 AS b FROM nodes
                  UNION ALL SELECT node, node + 2 FROM nodes
                  UNION ALL SELECT node, node + 3 FROM nodes
                  UNION ALL SELECT node, node * 2 FROM nodes) e
                WHERE a < b
                  AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
              tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM und e1
                JOIN und e2 ON e2.a = e1.b
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
              deg AS (
                SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
                  SELECT a AS node FROM und UNION ALL SELECT b FROM und)
                GROUP BY node),
              w AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
                           CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
              t AS (SELECT CAST(count(*) * 3 AS BIGINT) AS tri_x3 FROM tri),
              e AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
              SELECT w.n_nodes, e.n_edges, w.n_wedges, t.tri_x3,
                     CAST(t.tri_x3 AS DOUBLE) / w.n_wedges AS global_cc
              FROM w, t, e"""),
      doc = "global clustering coefficient: exact 3T (per-node participation " +
        "sum) over exact wedge count, oriented triangle side, one division"),

    // ---- Diameter lower bound by the standard DOUBLE-SWEEP heuristic:
    // BFS from the min node, take the farthest reached vertex (ties to
    // min id), BFS again from it — the second eccentricity lower-bounds
    // the diameter and is exact on trees. Bounded-round semantics is the
    // bfsHops contract (8 Pregel rounds here; the oracle unrolls the
    // identical monotone relaxation, so truncation is part of the
    // definition). Zero driver collects: the argmax hop between sweeps is
    // a 1-row TakeOrdered DataFrame seeding the next BFS.
    GQuery("graph_diameter_2sweep",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val und = graft.ops.GraphOps.chordGraph(nodes)
        val seed = nodes.agg(min(col("node")).as("node"))
        val d1 = graft.ops.GraphOps.bfsHops(seed, und, rounds = 8)
        // NOT checkpointed: keeping the TakeOrdered lineage is what proves
        // the 1-row bound to the BNLJ plan guard (a checkpointed RDD scan
        // reads as unbounded), and d1 is already a checkpoint so each of
        // the two references re-runs only the tiny argmax
        val far1 = d1.orderBy(col("dist").desc, col("node")).limit(1)
        val d2 = graft.ops.GraphOps.bfsHops(far1.select(col("node")), und, rounds = 8)
        val far2 = d2.orderBy(col("dist").desc, col("node")).limit(1)
        seed.select(col("node").as("seed_node"))
          .crossJoin(broadcast(far1.select(col("node").as("far_node"),
            col("dist").as("ecc_seed"))))
          .crossJoin(broadcast(far2.select(col("node").as("far2_node"),
            col("dist").as("diameter_lb"))))
          .crossJoin(broadcast(d2.agg(count(lit(1)).as("n_reached"))))
      },
      Some(diameter2SweepSql),
      doc = "diameter lower bound via double-sweep BFS (8 bounded Pregel " +
        "rounds per sweep, 1-row TakeOrdered argmax hop, no driver collect) " +
        "== unrolled monotone-relaxation oracle"),

    // ---- Stress centrality (single source, radius 6): Brandes'
    // two-phase shortest-path accumulation kept in the INTEGER semiring —
    // σ forward over the BFS DAG, suffix counts f backward, through =
    // σ·f. The exact-hash-safe member of the betweenness family (true
    // betweenness sums fractional δ whose float accumulation order
    // differs across engines). Top-20 via TakeOrderedAndProject.
    GQuery("graph_stress_centrality",
      (s, dir) => {
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        val und = graft.ops.GraphOps.chordGraph(nodes)
        val seed = nodes.agg(min(col("node")).as("node"))
        graft.ops.GraphOps.stressCentrality(seed, und, rounds = 6)
          .orderBy(col("through").desc, col("node"))
          .limit(20)
      },
      Some(stressSql),
      doc = "stress centrality (Shimbel/Brandes two-phase, integer " +
        "semiring): sigma forward + suffix counts backward over the " +
        "6-round BFS DAG, through = sigma*f, top-20 — exact where " +
        "fractional betweenness would break cross-engine"),

    // ---- k-truss peeling census (k=4): iteratively drop edges supported
    // by fewer than k−2 triangles — the triangle-density cousin of k-core
    // (cores bound degree, trusses bound cohesion; a 4-truss edge sits in
    // ≥2 triangles that themselves survive). Bounded-round contract (3
    // peels — the kcore/bfs convention; the fixpoint is this loop run to
    // no-change, and the oracle unrolls the identical rounds). Triangle
    // enumeration rides the DEGREE-ORDERED orientation
    // (GraphOps.orientedTriangles): wedge fan-out is a node's oriented
    // OUT-degree, O(√m) on ANY graph — the id-ordered x<y<z 3-join the
    // r13 version used is equivalent on this degree-bounded chord graph
    // (each triangle named once either way, so the census and oracle are
    // unchanged) but hub-quadratic on a power-law graph at 100×. Each
    // triangle maps back to its three canonical a<b edges for support;
    // per-round lineage cut. Per-round census output — edges in/out per
    // peel.
    GQuery("graph_ktruss_census",
      (s, dir) => {
        val k = 4
        val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
        var e = graft.ops.GraphOps.chordGraph(nodes)
        val census = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
        for (r <- 1 to 3) {
          val nIn = e.count()
          val tri = graft.ops.GraphOps.orientedTriangles(e)
          val sup = tri.select(explode(expr(
              "array(struct(least(u, v) AS a, greatest(u, v) AS b), " +
                "struct(least(u, w) AS a, greatest(u, w) AS b), " +
                "struct(least(v, w) AS a, greatest(v, w) AS b))"))
              .as("t"))
            .select(col("t.a").as("a"), col("t.b").as("b"))
            .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
          e = e.join(sup, Seq("a", "b"), "left")
            .filter(coalesce(col("support"), lit(0L)) >= (k - 2))
            .select(col("a"), col("b"))
            .localCheckpoint(true)
          census += ((r, nIn, e.count()))
        }
        import s.implicits._
        census.toSeq.toDF("round", "n_edges_in", "n_edges_out")
          .orderBy(col("round"))
      },
      Some(ktrussSql),
      doc = "k-truss (k=4) peeling census: 3 bounded peels of edges with " +
        "<2 supporting triangles, degree-ordered O(sqrt(m))-fanout triangle " +
        "enumeration, per-round edges in/out == unrolled-rounds oracle")
  )

  /** Unrolled stress-centrality oracle: bounded BFS (monotone relaxation,
    * the diameter2SweepSql pattern), then σ forward level by level over
    * the shortest-path DAG and f backward from the deepest level — every
    * level CTE MATERIALIZED (each is referenced by the next level and by
    * the final union).
    */
  private lazy val stressSql: String = {
    val R = 6
    val distRounds = (1 to R).map { r =>
      val prev = if (r == 1) "s0" else s"s${r - 1}"
      s"""s$r AS MATERIALIZED (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM $prev
         |    UNION ALL
         |    SELECT adj.v, $prev.dist + 1 FROM adj JOIN $prev ON adj.u = $prev.node)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    val sigLevels = (1 to R).map { k =>
      s"""sig$k AS MATERIALIZED (
         |  SELECT a.v AS node, CAST(SUM(p.sigma) AS BIGINT) AS sigma
         |  FROM adj a JOIN sig${k - 1} p ON a.u = p.node
         |  JOIN s$R d ON d.node = a.v AND d.dist = $k
         |  GROUP BY a.v)""".stripMargin
    }.mkString(",\n")
    val fLevels = ((R - 1) to 0 by -1).map { k =>
      s"""f$k AS MATERIALIZED (
         |  SELECT d.node,
         |         CAST(1 + COALESCE(c.fsum, 0) AS BIGINT) AS f
         |  FROM (SELECT node FROM s$R WHERE dist = $k) d
         |  LEFT JOIN (
         |    SELECT a.u AS node, CAST(SUM(fw.f) AS BIGINT) AS fsum
         |    FROM adj a JOIN f${k + 1} fw ON fw.node = a.v
         |    GROUP BY a.u) c USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH nodes AS (SELECT c_custkey AS node FROM customer),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT node AS a, node + 1 AS b FROM nodes
       |    UNION ALL SELECT node, node + 2 FROM nodes
       |    UNION ALL SELECT node, node + 3 FROM nodes
       |    UNION ALL SELECT node, node * 2 FROM nodes) e
       |  WHERE a < b
       |    AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
       |adj AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
       |s0 AS (SELECT min(node) AS node, 0 AS dist FROM nodes),
       |$distRounds,
       |sig0 AS (SELECT node, CAST(1 AS BIGINT) AS sigma FROM s$R WHERE dist = 0),
       |$sigLevels,
       |f$R AS MATERIALIZED (
       |  SELECT node, CAST(1 AS BIGINT) AS f FROM s$R WHERE dist = $R),
       |$fLevels,
       |sig AS (${(0 to R).map(k => s"SELECT * FROM sig$k").mkString(" UNION ALL ")}),
       |ff AS (${(0 to R).map(k => s"SELECT * FROM f$k").mkString(" UNION ALL ")})
       |SELECT s.node, CAST(d.dist AS INT) AS dist, s.sigma, ff.f,
       |       s.sigma * ff.f AS through
       |FROM sig s JOIN ff ON ff.node = s.node JOIN s$R d ON d.node = s.node
       |ORDER BY through DESC, s.node LIMIT 20""".stripMargin
  }

  /** Unrolled 3-round k-truss oracle: per round the x<y<z triangle 3-join
    * over the current edge set, per-edge support by unioning the three
    * triangle edges, inner-join keep at support ≥ 2 (edges in no triangle
    * vanish from the support table and drop out). Every round CTE is
    * MATERIALIZED (each referenced by the triangle 3-join three times).
    */
  private lazy val ktrussSql: String = {
    val rounds = (1 to 3).map { r =>
      val prev = if (r == 1) "e0" else s"e${r - 1}"
      s"""tri$r AS MATERIALIZED (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM $prev e1
         |  JOIN $prev e2 ON e2.a = e1.b
         |  JOIN $prev e3 ON e3.a = e1.a AND e3.b = e2.b),
         |sup$r AS MATERIALIZED (
         |  SELECT a, b, count(*) AS support FROM (
         |    SELECT x AS a, y AS b FROM tri$r
         |    UNION ALL SELECT y, z FROM tri$r
         |    UNION ALL SELECT x, z FROM tri$r)
         |  GROUP BY a, b),
         |e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM $prev e
         |  JOIN sup$r s ON s.a = e.a AND s.b = e.b
         |  WHERE s.support >= 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH nodes AS (SELECT c_custkey AS node FROM customer),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT node AS a, node + 1 AS b FROM nodes
       |    UNION ALL SELECT node, node + 2 FROM nodes
       |    UNION ALL SELECT node, node + 3 FROM nodes
       |    UNION ALL SELECT node, node * 2 FROM nodes) e
       |  WHERE a < b
       |    AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
       |$rounds
       |SELECT 1 AS round, (SELECT count(*) FROM e0) AS n_edges_in,
       |       (SELECT count(*) FROM e1) AS n_edges_out
       |UNION ALL
       |SELECT 2, (SELECT count(*) FROM e1), (SELECT count(*) FROM e2)
       |UNION ALL
       |SELECT 3, (SELECT count(*) FROM e2), (SELECT count(*) FROM e3)
       |ORDER BY round""".stripMargin
  }

  /** Unrolled double-sweep BFS oracle: two 8-round monotone relaxations,
    * every round CTE MATERIALIZED (each references its predecessor twice —
    * un-materialized, DuckDB would inline the chain 2¹⁶-fold).
    */
  private lazy val diameter2SweepSql: String = {
    def rounds(prefix: String, init: String, n: Int): String =
      (1 to n).map { r =>
        val prev = if (r == 1) init else s"$prefix${r - 1}"
        s"""$prefix$r AS MATERIALIZED (
           |  SELECT node, min(dist) AS dist FROM (
           |    SELECT node, dist FROM $prev
           |    UNION ALL
           |    SELECT adj.v, $prev.dist + 1 FROM adj JOIN $prev ON adj.u = $prev.node)
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n")
    s"""WITH nodes AS (SELECT c_custkey AS node FROM customer),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT node AS a, node + 1 AS b FROM nodes
       |    UNION ALL SELECT node, node + 2 FROM nodes
       |    UNION ALL SELECT node, node + 3 FROM nodes
       |    UNION ALL SELECT node, node * 2 FROM nodes) e
       |  WHERE a < b
       |    AND EXISTS (SELECT 1 FROM nodes n WHERE n.node = e.b)),
       |adj AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
       |s0 AS (SELECT min(node) AS node, 0 AS dist FROM nodes),
       |${rounds("s", "s0", 8)},
       |f1 AS (SELECT node, dist FROM s8 ORDER BY dist DESC, node LIMIT 1),
       |t0 AS (SELECT node, 0 AS dist FROM f1),
       |${rounds("t", "t0", 8)},
       |f2 AS (SELECT node, dist FROM t8 ORDER BY dist DESC, node LIMIT 1)
       |SELECT s0.node AS seed_node, f1.node AS far_node,
       |       CAST(f1.dist AS INT) AS ecc_seed,
       |       f2.node AS far2_node, CAST(f2.dist AS INT) AS diameter_lb,
       |       (SELECT count(*) FROM t8) AS n_reached
       |FROM s0, f1, f2""".stripMargin
  }
}
