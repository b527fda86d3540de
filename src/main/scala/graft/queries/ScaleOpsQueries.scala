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
      doc = "bucketed tables co-locate the join: zero-exchange SMJ + partial agg on the bucket key")
  )
}
