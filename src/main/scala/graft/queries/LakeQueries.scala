package graft.queries

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GQuery, Tables}

/** The [[graft.lake.GraftCatalog]] SQL surface, oracle-checked: every
  * statement sequence runs against a FRESH table in a scratch warehouse
  * (per-invocation unique name, so reruns and bench repetitions are
  * independent), and the final SELECT's contents are re-derived in pure
  * DuckDB SQL over the same source parquet. This proves the whole stack —
  * catalog resolution, executor parquet writes, CAS version commits,
  * group-based MERGE/UPDATE/DELETE rewrites, time travel — produces
  * exactly the state the declarative semantics demand.
  *
  * Cross-engine numeric contract: prices become integer cents via
  * `floor(o_totalprice * 100)` — double multiply + floor are IEEE-exact
  * and identical in both engines; all later arithmetic is integral.
  */
object LakeQueries {

  private val seq = new AtomicLong(0)

  /** Register the catalog once per session; scratch warehouse per JVM. */
  private def ensureCatalog(s: SparkSession): Unit =
    graft.lake.GraftCatalog.ensureScratchCatalog(s)

  /** A fresh `orders` projection view + a fresh empty lake table; returns
    * (table name, source view name). `tblProperties` is appended verbatim
    * to the CREATE TABLE (e.g. a `TBLPROPERTIES (...)` clause).
    */
  private def freshTable(s: SparkSession, dir: String, tag: String,
                         tblProperties: String = ""): (String, String) = {
    ensureCatalog(s)
    val id = seq.incrementAndGet()
    val view = s"lake_orders_${tag}_$id"
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * lit(100)).cast("long").as("price_cents"),
        col("o_orderstatus").as("status"))
      .createOrReplaceTempView(view)
    val table = s"graftlake.q.${tag}_$id"
    s.sql(s"CREATE TABLE $table (o_orderkey BIGINT, o_custkey BIGINT, " +
      s"price_cents BIGINT, status STRING) $tblProperties")
    (table, view)
  }

  private val ordersCentsSql =
    """SELECT o_orderkey, o_custkey,
       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
       o_orderstatus AS status FROM orders"""

  /** Resolve a lake table through the catalog's own metadata
    * (PROP_LOCATION), not by reimplementing its directory layout —
    * returns the DSv2 table plus a [[graft.stages.MergeTable]] handle on
    * its storage root for maintenance/CDC entry points that live below
    * the SQL surface.
    */
  private def storageHandle(s: SparkSession, table: String)
      : (org.apache.spark.sql.connector.catalog.Table, graft.stages.MergeTable) = {
    val cat = s.sessionState.catalogManager.catalog("graftlake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("q"), table.split('.').last)
    val lakeTable = cat.loadTable(ident)
    val tableDir = lakeTable.properties().get(
      org.apache.spark.sql.connector.catalog.TableCatalog.PROP_LOCATION)
    (lakeTable, new graft.stages.MergeTable(tableDir, Seq.empty))
  }

  val all: Seq[GQuery] = Seq(

    // ---- Write-Audit-Publish (the Iceberg WAP pattern): a batch lands in
    // a STAGING table, the expectation suite audits what storage actually
    // holds, and only a green audit promotes the snapshot into the prod
    // table — a red audit leaves prod untouched. Attempt 1 plants
    // violations (negative values via a deterministic mutation) and must
    // be rejected; attempt 2 is clean and publishes. The census is the
    // audit trail a data-platform run records; prod row count proves the
    // gate held (0 after reject, full after publish).
    GQuery("lake_write_audit_publish",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
        val staging = graft.stages.MergeTable.scratch(Seq("event_id"))
        val prod = graft.stages.MergeTable.scratch(Seq("event_id"))
        def audit(name: String, batch: org.apache.spark.sql.DataFrame) = {
          staging.replace(batch)
          val staged = staging.read(s, batch.schema)
          val viol = staged.agg(
            count(when(col("cents") < 0, lit(1))).as("n_violations"),
            count(lit(1)).as("n_staged")).collect().head
          val (nv, ns) = (viol.getLong(0), viol.getLong(1))
          val published = nv == 0L
          if (published) prod.replace(staging.read(s, batch.schema))
          val nProd = prod.currentVersion
            .map(_ => prod.read(s, batch.schema).count()).getOrElse(0L)
          (name, ns, nv, published, nProd)
        }
        // attempt 1: every 10th event's cents flipped negative — must fail
        val bad = ev.withColumn("cents",
          when(col("event_id") % 10 === 0, -col("cents")).otherwise(col("cents")))
        val a1 = audit("attempt_1_planted", bad)
        val a2 = audit("attempt_2_clean", ev)
        Seq(a1, a2).toDF("attempt", "n_staged", "n_violations", "published", "n_prod")
          .orderBy(col("attempt"))
      },
      Some("""WITH e AS (SELECT event_id,
                                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                         FROM events),
              t AS (SELECT count(*) AS n,
                           -- negation flips sign only for strictly positive cents
                           CAST(count(*) FILTER (event_id % 10 = 0 AND cents > 0) AS BIGINT) AS n_bad
                    FROM e)
              SELECT 'attempt_1_planted' AS attempt, n AS n_staged,
                     n_bad AS n_violations, FALSE AS published,
                     CAST(0 AS BIGINT) AS n_prod
              FROM t
              UNION ALL
              SELECT 'attempt_2_clean', n, 0, TRUE, n FROM t
              ORDER BY attempt"""),
      doc = "write-audit-publish gate: staged snapshot audited from storage, " +
        "planted violations block promotion (prod stays empty), clean batch " +
        "publishes — the Iceberg WAP governance pattern on MergeTable"),

    GQuery("lake_merge_into",
      (s, dir) => {
        val (t, view) = freshTable(s, dir, "merge")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey % 7 < 3")
        s.sql(s"""MERGE INTO $t t
                  USING (SELECT o_orderkey, o_custkey, price_cents + 1111 AS price_cents,
                                'S' AS status
                         FROM $view WHERE o_orderkey % 7 IN (2, 3)) s
                  ON t.o_orderkey = s.o_orderkey
                  WHEN MATCHED AND s.price_cents % 10 < 3 THEN DELETE
                  WHEN MATCHED THEN UPDATE SET price_cents = s.price_cents, status = s.status
                  WHEN NOT MATCHED AND s.price_cents % 2 = 0 THEN
                    INSERT (o_orderkey, o_custkey, price_cents, status)
                    VALUES (s.o_orderkey, s.o_custkey, s.price_cents, s.status)
                  WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 11 = 0 THEN DELETE""")
        s.sql(s"SELECT * FROM $t ORDER BY o_orderkey")
      },
      Some(s"""WITH o AS ($ordersCentsSql),
                    base AS (SELECT * FROM o WHERE o_orderkey % 7 < 3),
                    src AS (SELECT o_orderkey, o_custkey, price_cents + 1111 AS price_cents,
                                   'S' AS status
                            FROM o WHERE o_orderkey % 7 IN (2, 3))
               SELECT b.o_orderkey, b.o_custkey, s.price_cents, s.status
               FROM base b JOIN src s USING (o_orderkey)
               WHERE s.price_cents % 10 >= 3
               UNION ALL
               SELECT b.* FROM base b
               WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM src)
                 AND b.o_orderkey % 11 <> 0
               UNION ALL
               SELECT s.* FROM src s
               WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM base)
                 AND s.price_cents % 2 = 0
               ORDER BY o_orderkey"""),
      doc = "SQL MERGE INTO with update/delete/insert/not-matched-by-source clauses " +
        "through the group-based row-level-operation rewrite, vs a declarative oracle"),

    GQuery("lake_update_delete_travel",
      (s, dir) => {
        val (t, view) = freshTable(s, dir, "scd")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey % 13 = 0")   // v0
        s.sql(s"UPDATE $t SET price_cents = price_cents + 5 WHERE status = 'O'") // v1
        s.sql(s"DELETE FROM $t WHERE status = 'F'")                              // v2
        s.sql(s"""SELECT 'v0' AS version, count(*) AS n_rows,
                         sum(price_cents) AS total_cents FROM $t VERSION AS OF 'v0'
                  UNION ALL
                  SELECT 'v1', count(*), sum(price_cents) FROM $t VERSION AS OF 'v1'
                  UNION ALL
                  SELECT 'v2', count(*), sum(price_cents) FROM $t
                  ORDER BY version""")
      },
      Some(s"""WITH o AS ($ordersCentsSql),
                    v0 AS (SELECT * FROM o WHERE o_orderkey % 13 = 0),
                    v1 AS (SELECT o_orderkey, o_custkey,
                                  CASE WHEN status = 'O' THEN price_cents + 5
                                       ELSE price_cents END AS price_cents, status
                           FROM v0),
                    v2 AS (SELECT * FROM v1 WHERE status <> 'F')
               SELECT 'v0' AS version, count(*) AS n_rows,
                      CAST(sum(price_cents) AS BIGINT) AS total_cents FROM v0
               UNION ALL
               SELECT 'v1', count(*), CAST(sum(price_cents) AS BIGINT) FROM v1
               UNION ALL
               SELECT 'v2', count(*), CAST(sum(price_cents) AS BIGINT) FROM v2
               ORDER BY version"""),
      doc = "UPDATE + DELETE rewrites with VERSION AS OF time travel across the " +
        "resulting immutable snapshots"),

    GQuery("lake_insert_append_overwrite",
      (s, dir) => {
        val (t, view) = freshTable(s, dir, "ins")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey % 5 = 0")  // v0
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey % 5 = 1")  // v1: append
        s.sql(s"INSERT OVERWRITE $t SELECT * FROM $view " +
          "WHERE o_orderkey % 5 = 2 AND status = 'O'")                         // v2: replace
        s.sql(s"""SELECT 'cur' AS snap, o_orderkey, price_cents FROM $t
                  UNION ALL
                  SELECT 'v1', o_orderkey, price_cents FROM $t VERSION AS OF 'v1'
                  ORDER BY snap, o_orderkey""")
      },
      Some(s"""WITH o AS ($ordersCentsSql)
               SELECT 'cur' AS snap, o_orderkey, price_cents FROM o
               WHERE o_orderkey % 5 = 2 AND status = 'O'
               UNION ALL
               SELECT 'v1', o_orderkey, price_cents FROM o
               WHERE o_orderkey % 5 IN (0, 1)
               ORDER BY snap, o_orderkey"""),
      doc = "INSERT INTO appends (hard-link carry-forward of previous version) and " +
        "INSERT OVERWRITE truncate semantics, both time-travel-visible"),

    // ---- DYNAMIC partition overwrite — the backfill semantic
    // lake_insert_append_overwrite's truncate-overwrite can't give: a
    // corrected batch for ONE day replaces ONLY that day's partition
    // directory; every untouched partition survives byte-for-byte. The
    // oracle proves it: all slots carry their original sums except the
    // rewritten slot's +1-per-row correction. At 100 TB this is how a
    // late-arriving day is repaired without rewriting the table.
    GQuery("lake_dynamic_partition_overwrite",
      (s, dir) => {
        val out = graft.stages.TempDirs.scratch("graft_dpo_")
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"),
            expr("unix_micros(ts) div 86400000000 % 31").as("day_slot"))
        ev.write.partitionBy("day_slot").mode("overwrite").parquet(out)
        val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode")
        try {
          s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          ev.filter(col("day_slot") === 3)
            .withColumn("cents", col("cents") + 1)
            .write.partitionBy("day_slot").mode("overwrite").parquet(out)
        } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        s.read.parquet(out)
          .groupBy(col("day_slot").cast("long").as("day_slot"))
          .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
          .orderBy(col("day_slot"))
      },
      Some("""SELECT epoch_us(ts) // 86400000000 % 31 AS day_slot,
                     count(*) AS n_events,
                     CAST(SUM(CAST(floor(value * 100) AS BIGINT)
                          + CASE WHEN epoch_us(ts) // 86400000000 % 31 = 3
                                 THEN 1 ELSE 0 END) AS BIGINT) AS total_cents
              FROM events GROUP BY 1 ORDER BY day_slot"""),
      doc = "dynamic partition overwrite: a corrected one-day batch replaces " +
        "only its partition directory; untouched partitions survive (backfill " +
        "repair without a table rewrite)"),

    GQuery("lake_schema_evolution",
      (s, dir) => {
        val (t, view) = freshTable(s, dir, "evo")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey % 17 = 0")
        s.sql(s"ALTER TABLE $t ADD COLUMN bonus_cents BIGINT")     // metadata-only
        // old files read NULL for the new column; the UPDATE rewrite then
        // fills it for one segment, proving evolved columns are writable
        s.sql(s"UPDATE $t SET bonus_cents = price_cents div 10 WHERE status = 'O'")
        s.sql(s"INSERT INTO $t SELECT o_orderkey + 1000000, o_custkey, price_cents, " +
          s"status, 77 FROM $view WHERE o_orderkey % 17 = 1 AND o_orderkey < 3000")
        s.sql(s"SELECT o_orderkey, price_cents, status, bonus_cents FROM $t " +
          "ORDER BY o_orderkey")
      },
      Some(s"""WITH o AS ($ordersCentsSql),
                    v0 AS (SELECT * FROM o WHERE o_orderkey % 17 = 0),
                    evolved AS (SELECT o_orderkey, price_cents, status,
                                       CASE WHEN status = 'O' THEN price_cents // 10
                                            ELSE NULL END AS bonus_cents
                                FROM v0),
                    inserted AS (SELECT o_orderkey + 1000000 AS o_orderkey, price_cents,
                                        status, CAST(77 AS BIGINT) AS bonus_cents
                                 FROM o WHERE o_orderkey % 17 = 1 AND o_orderkey < 3000)
               SELECT o_orderkey, price_cents, status, bonus_cents FROM evolved
               UNION ALL
               SELECT o_orderkey, price_cents, status, bonus_cents FROM inserted
               ORDER BY o_orderkey"""),
      doc = "metadata-only ALTER TABLE ADD COLUMN: old files NULL-backfill, the " +
        "UPDATE rewrite fills the evolved column, new inserts carry it"),

    GQuery("lake_rowlevel_pruned",
      (s, dir) => {
        // key-range-clustered inserts (one commit per range) build a table
        // whose files have disjoint o_orderkey footer ranges, so the
        // DELETE/UPDATE prune file groups statically and the MERGE prunes
        // at runtime through the declared filter column — the carried
        // files survive as hard links, and this final SELECT proves the
        // carried + rewritten union is exactly the declarative result
        val (t, view) = freshTable(s, dir, "prune",
          "TBLPROPERTIES ('graft.filter.columns' = 'o_orderkey')")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey < 20000")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey >= 20000 AND o_orderkey < 40000")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey >= 40000")
        s.sql(s"DELETE FROM $t WHERE o_orderkey >= 25000 AND o_orderkey < 26000 AND status = 'F'")
        s.sql(s"UPDATE $t SET price_cents = price_cents + 7 WHERE o_orderkey < 5000")
        s.sql(s"""MERGE INTO $t t
                  USING (SELECT o_orderkey, price_cents FROM $view
                         WHERE o_orderkey >= 40000 AND o_orderkey % 9 = 4) s
                  ON t.o_orderkey = s.o_orderkey
                  WHEN MATCHED THEN UPDATE SET price_cents = s.price_cents + 33""")
        s.sql(s"""MERGE INTO $t t
                  USING (SELECT o_orderkey + 90000000 AS o_orderkey, o_custkey,
                                price_cents, 'N' AS status FROM $view
                         WHERE o_orderkey % 9 = 5 AND o_orderkey < 2000) s
                  ON t.o_orderkey = s.o_orderkey
                  WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey, price_cents, status)
                    VALUES (s.o_orderkey, s.o_custkey, s.price_cents, s.status)""")
        s.sql(s"""SELECT status, count(*) AS n_rows, sum(price_cents) AS total_cents,
                         min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
                  FROM $t GROUP BY status ORDER BY status""")
      },
      Some(s"""WITH o AS ($ordersCentsSql),
                    afterdel AS (SELECT * FROM o WHERE NOT
                      (o_orderkey >= 25000 AND o_orderkey < 26000 AND status = 'F')),
                    afterupd AS (SELECT o_orderkey, o_custkey,
                                        CASE WHEN o_orderkey < 5000 THEN price_cents + 7
                                             ELSE price_cents END AS price_cents, status
                                 FROM afterdel),
                    src_m AS (SELECT o_orderkey, price_cents FROM o
                              WHERE o_orderkey >= 40000 AND o_orderkey % 9 = 4),
                    merged AS (SELECT a.o_orderkey, a.o_custkey,
                                      COALESCE(s.price_cents + 33, a.price_cents) AS price_cents,
                                      a.status
                               FROM afterupd a LEFT JOIN src_m s USING (o_orderkey)),
                    ins AS (SELECT o_orderkey + 90000000 AS o_orderkey, o_custkey,
                                   price_cents, 'N' AS status FROM o
                            WHERE o_orderkey % 9 = 5 AND o_orderkey < 2000),
                    finalt AS (SELECT * FROM merged UNION ALL SELECT * FROM ins)
               SELECT status, count(*) AS n_rows,
                      CAST(sum(price_cents) AS BIGINT) AS total_cents,
                      CAST(min(o_orderkey) AS BIGINT) AS min_key,
                      CAST(max(o_orderkey) AS BIGINT) AS max_key
               FROM finalt GROUP BY status ORDER BY status"""),
      doc = "per-file group replacement: key-range-clustered files, DELETE/UPDATE " +
        "prune statically via footer min/max, MERGE prunes at runtime via the " +
        "declared filter column; carried hard links + rewrites equal the " +
        "declarative result"),

    GQuery("lake_optimize_cluster",
      (s, dir) => {
        // OPTIMIZE ZORDER maintenance between writes: the clustered rewrite
        // must be invisible to query semantics (same rows, new layout), and
        // the row-level ops after it still produce the declarative result
        // while pruning against the now-tight per-file footer ranges
        val (t, view) = freshTable(s, dir, "opt")
        s.sql(s"INSERT INTO $t SELECT * FROM $view")
        val (lakeTable, mt) = storageHandle(s, t)
        mt.compact(s, numFiles = 8, clusterBy = Seq("o_custkey", "price_cents"),
          declaredSchema = Some(lakeTable.schema()))
        s.sql(s"DELETE FROM $t WHERE o_custkey < 300 AND price_cents < 10000000")
        s.sql(s"UPDATE $t SET status = 'Z' WHERE o_custkey >= 1200 AND price_cents >= 25000000")
        s.sql(s"""SELECT status, count(*) AS n_rows, sum(price_cents) AS total_cents,
                         sum(o_custkey) AS custkey_sum
                  FROM $t GROUP BY status ORDER BY status""")
      },
      Some(s"""WITH o AS ($ordersCentsSql),
                    afterdel AS (SELECT * FROM o WHERE NOT
                      (o_custkey < 300 AND price_cents < 10000000)),
                    afterupd AS (SELECT o_orderkey, o_custkey, price_cents,
                                        CASE WHEN o_custkey >= 1200 AND price_cents >= 25000000
                                             THEN 'Z' ELSE status END AS status
                                 FROM afterdel)
               SELECT status, count(*) AS n_rows,
                      CAST(sum(price_cents) AS BIGINT) AS total_cents,
                      CAST(sum(o_custkey) AS BIGINT) AS custkey_sum
               FROM afterupd GROUP BY status ORDER BY status"""),
      doc = "z-order clustered compaction (OPTIMIZE ZORDER BY custkey, price) as a " +
        "pure-maintenance commit, then DELETE/UPDATE whose 2-D predicates prune " +
        "the clustered file groups; result matches the layout-blind oracle"),

    // ---- Small-files compaction (OPTIMIZE without clustering): the
    // steady-state lakehouse maintenance job — micro-batch ingestion
    // leaves a 64-file version (one file per REPARTITION(64) task, the
    // streaming-append shape), whose per-file open/footer cost dominates
    // scans long before data size does; bin-packing the version to 4
    // files is a PURE maintenance commit (same rows, new layout). The
    // census reads the table's own version manifest for the file counts
    // and re-aggregates the content in both phases, so the oracle
    // (layout-blind content + the two pinned file counts) proves both
    // the physical rewrite and its semantic invisibility.
    GQuery("lake_compact_small_files",
      (s, dir) => {
        val (t, view) = freshTable(s, dir, "cmps")
        s.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(64) */ * FROM $view")
        val (lakeTable, mt) = storageHandle(s, t)
        def census(phase: String): org.apache.spark.sql.DataFrame = {
          val nFiles = mt.dataFiles(mt.currentVersion.get).size.toLong
          s.sql(s"""SELECT count(*) AS n_rows,
                           CAST(sum(price_cents) AS BIGINT) AS total_cents
                    FROM $t""")
            .select(lit(phase).as("phase"), lit(nFiles).as("n_files"),
              col("n_rows"), col("total_cents"))
        }
        val before = census("1_before")
        mt.compact(s, numFiles = 4, declaredSchema = Some(lakeTable.schema()))
        val after = census("2_after")
        before.unionByName(after).orderBy(col("phase"))
      },
      Some(s"""WITH o AS ($ordersCentsSql),
               |c AS (SELECT count(*) AS n_rows,
               |             CAST(sum(price_cents) AS BIGINT) AS total_cents
               |      FROM o)
               |SELECT '1_before' AS phase, CAST(64 AS BIGINT) AS n_files,
               |       n_rows, total_cents FROM c
               |UNION ALL
               |SELECT '2_after', CAST(4 AS BIGINT), n_rows, total_cents FROM c
               |ORDER BY phase""".stripMargin),
      doc = "small-files compaction census: a 64-file ingest version " +
        "bin-packed to 4 files as a pure maintenance commit — file counts " +
        "off the version manifest, content re-aggregated in both phases " +
        "== the layout-blind oracle (semantic invisibility, pinned counts)"),

    // ---- Deletion vectors (merge-on-read DELETE): the modern lakehouse
    // answer when the predicate kills few rows — copy-on-write rewrites
    // whole file groups, a deletion vector writes only a (file, row
    // position) sidecar and the scan anti-applies it (Delta DVs /
    // Iceberg position deletes). Two deletes ACCUMULATE into the
    // version's sidecar while the 8 data files stay byte-identical (the
    // pinned n_files proves no rewrite happened); reconcile (the
    // OPTIMIZE half) folds the vectors into a fresh 4-file version and
    // drops them. Both phases re-aggregate content, so the oracle (the
    // layout-blind double-NOT filter) proves MOR scan == COW result.
    GQuery("lake_deletion_vectors",
      (s, dir) => {
        val src = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("price_cents"),
            col("o_orderstatus").as("status"))
        val mt = graft.stages.MergeTable.scratch(Seq("o_orderkey"))
        mt.replace(src)
        mt.compact(s, numFiles = 8) // pin the physical layout the DVs target
        mt.deleteVectors(s, col("status") === "F" && col("o_custkey") % 5 === 2)
        mt.deleteVectors(s, col("price_cents") < 10000000)
        def census(phase: String, df: org.apache.spark.sql.DataFrame,
                   nFiles: Long): org.apache.spark.sql.DataFrame =
          df.agg(count(lit(1)).as("n_rows"),
              sum(col("price_cents")).cast("long").as("total_cents"))
            .select(lit(phase).as("phase"), lit(nFiles).as("n_files"),
              col("n_rows"), col("total_cents"))
        val mor = census("1_mor", mt.readWithDeletes(s, src.schema),
          mt.dataFiles(mt.currentVersion.get).size.toLong)
        mt.reconcileDeletes(s, numFiles = 4)
        val cow = census("2_reconciled", mt.read(s, src.schema),
          mt.dataFiles(mt.currentVersion.get).size.toLong)
        mor.unionByName(cow).orderBy(col("phase"))
      },
      Some(s"""WITH o AS ($ordersCentsSql),
              |kept AS (SELECT * FROM o
              |         WHERE NOT (status = 'F' AND o_custkey % 5 = 2)
              |           AND NOT (price_cents < 10000000)),
              |c AS (SELECT count(*) AS n_rows,
              |             CAST(sum(price_cents) AS BIGINT) AS total_cents
              |      FROM kept)
              |SELECT '1_mor' AS phase, CAST(8 AS BIGINT) AS n_files,
              |       n_rows, total_cents FROM c
              |UNION ALL
              |SELECT '2_reconciled', CAST(4 AS BIGINT), n_rows, total_cents FROM c
              |ORDER BY phase""".stripMargin),
      doc = "deletion vectors (merge-on-read DELETE): two accumulated " +
        "(file, row-position) sidecar deletes leave the 8 data files " +
        "untouched (pinned count), the scan anti-applies them via one " +
        "broadcast anti-join; reconcile folds DVs into a fresh 4-file " +
        "version — MOR scan == COW result == layout-blind oracle"),

    // ---- DV × CDC coherence: deletion-vector deletes must surface in
    // the change feed once reconciled — the cross-feature invariant a
    // lakehouse consumer (an incremental view, a downstream sync)
    // actually depends on. changesBetween(pre-DV version, reconciled
    // version) emits EXACTLY the DV'd rows as 'delete' events: rows the
    // reconcile merely re-filed cancel in the multiset diff, so the
    // feed is the semantic deletes and nothing else.
    GQuery("lake_dv_cdc",
      (s, dir) => {
        val src = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("price_cents"),
            col("o_orderstatus").as("status"))
        val mt = graft.stages.MergeTable.scratch(Seq("o_orderkey"))
        mt.replace(src)
        mt.compact(s, numFiles = 8)
        val from = mt.currentVersion.get
        mt.deleteVectors(s, col("status") === "F" && col("o_custkey") % 5 === 2)
        mt.deleteVectors(s, col("price_cents") < 10000000)
        mt.reconcileDeletes(s, numFiles = 4)
        mt.changesBetween(s, from, mt.currentVersion.get, Seq("o_orderkey"))
          .select(col("change_type"), col("o_orderkey"), col("o_custkey"),
            col("price_cents"), col("status"))
          .orderBy(col("change_type"), col("o_orderkey"))
      },
      Some(s"""WITH o AS ($ordersCentsSql)
              |SELECT 'delete' AS change_type, o_orderkey, o_custkey,
              |       price_cents, status
              |FROM o
              |WHERE (status = 'F' AND o_custkey % 5 = 2)
              |   OR price_cents < 10000000
              |ORDER BY change_type, o_orderkey""".stripMargin),
      doc = "deletion vectors surface in the change feed: " +
        "changesBetween(pre-DV, reconciled) == exactly the DV'd rows as " +
        "'delete' events — re-filed survivors cancel in the multiset " +
        "diff, the cross-feature invariant downstream syncs depend on"),

    // ---- SQL DELETE through deletion vectors: the decision ladder a
    // real lakehouse runs on `DELETE FROM t WHERE ...` — metadata-only
    // when footer stats prove whole files drop; a DV sidecar when the
    // table opts in (graft.dv.delete.maxRows) and the hit set is small;
    // group rewrite otherwise. Both predicates here straddle every file
    // (round-robin layout) and match few rows, so the ladder lands on DV:
    // the statements commit NO version and rewrite NO file (the pinned
    // version/file-count prove it), the catalog scan anti-applies the
    // pending deletes (phase-1 aggregates run against the wrapped scan),
    // and reconcile folds the sidecar into a fresh 4-file version.
    GQuery("lake_sql_delete_dv",
      (s, dir) => {
        import s.implicits._
        val (t, view) = freshTable(s, dir, "dvsql",
          s"TBLPROPERTIES ('${graft.lake.GraftTable.DvDeleteMaxRowsProp}' = '100000')")
        s.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(8) */ * FROM $view") // v0, 8 pinned files
        val (_, mt) = storageHandle(s, t)
        s.sql(s"DELETE FROM $t WHERE price_cents < 10000000") // DV append, no commit
        s.sql(s"DELETE FROM $t WHERE status = 'P'")           // accumulates into the sidecar
        // collect NOW: the aggregate must execute against the DV-pending
        // scan (a lazy plan would run post-reconcile and dodge the wrapper)
        def agg(): (Long, Long) = {
          val r = s.sql(s"SELECT count(*) AS n, CAST(sum(price_cents) AS BIGINT) " +
            s"AS tc FROM $t").collect()(0)
          (r.getLong(0), r.getLong(1))
        }
        val v0 = mt.currentVersion.get
        val f0 = mt.dataFiles(v0).size.toLong
        val (n1, c1) = agg()
        mt.reconcileDeletes(s, numFiles = 4)
        val v1 = mt.currentVersion.get
        val f1 = mt.dataFiles(v1).size.toLong
        val (n2, c2) = agg()
        Seq(("1_dv_pending", v0, f0, n1, c1), ("2_reconciled", v1, f1, n2, c2))
          .toDF("phase", "version", "n_files", "n_rows", "total_cents")
          .orderBy(col("phase"))
      },
      Some(s"""WITH o AS ($ordersCentsSql),
              |kept AS (SELECT * FROM o
              |         WHERE NOT (price_cents < 10000000) AND NOT (status = 'P')),
              |c AS (SELECT count(*) AS n_rows,
              |             CAST(sum(price_cents) AS BIGINT) AS total_cents
              |      FROM kept)
              |SELECT '1_dv_pending' AS phase, 'v0' AS version,
              |       CAST(8 AS BIGINT) AS n_files, n_rows, total_cents FROM c
              |UNION ALL
              |SELECT '2_reconciled', 'v1', CAST(4 AS BIGINT), n_rows, total_cents FROM c
              |ORDER BY phase""".stripMargin),
      doc = "SQL DELETE through the DV ladder: two selective deletes on a " +
        "DV-enabled table commit only a sidecar (version pinned at v0, " +
        "all 8 files untouched), the catalog scan anti-applies the pending " +
        "predicates, reconcile folds to a 4-file v1 — both phases == the " +
        "layout-blind double-NOT oracle"),

    // ---- DV reconcile census: merge-on-read's monitoring twin, the
    // same convention the graph index got (staleness card whose
    // recommendation IS the maintain trigger). The census prices the
    // read tax — sidecar rows vs the version's manifest row count — and
    // reconcileIfRecommended fires on the census's own ≥5% predicate:
    // a 0.1% delete is not worth a rewrite (trigger no-ops, version
    // pinned), the accumulated 49% delete is (trigger fires, sidecar
    // folded). Integer-only output, trigger == threshold by construction.
    GQuery("lake_dv_reconcile_census",
      (s, dir) => {
        import s.implicits._
        val src = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("price_cents"),
            col("o_orderstatus").as("status"))
        val mt = graft.stages.MergeTable.scratch(Seq("o_orderkey"))
        mt.replace(src)
        mt.compact(s, numFiles = 8) // v1: pinned layout the DVs target
        def phase(name: String): (String, String, Long, Long, Int, Int, String) = {
          val c = mt.deleteVectorCensus(s).collect()(0)
          val fired = mt.reconcileIfRecommended(s, numFiles = 4)
          (name, c.getString(0), c.getLong(1), c.getLong(2),
            if (c.getBoolean(3)) 1 else 0, if (fired) 1 else 0,
            mt.currentVersion.get)
        }
        mt.deleteVectors(s, col("o_orderkey") % 1000 === 7) // ~0.1%: below trigger
        val p1 = phase("1_small")
        mt.deleteVectors(s, col("status") === "F")          // ~49%: above trigger
        val p2 = phase("2_bulk")
        Seq(p1, p2).toDF("phase", "version", "table_rows", "dv_rows",
          "reconcile_recommended", "fired", "version_after")
          .orderBy(col("phase"))
      },
      Some(s"""WITH o AS ($ordersCentsSql),
              |tot AS (SELECT count(*) AS table_rows FROM o),
              |d1 AS (SELECT count(*) AS dv FROM o WHERE o_orderkey % 1000 = 7),
              |d2 AS (SELECT count(*) AS dv FROM o
              |       WHERE o_orderkey % 1000 = 7 OR status = 'F')
              |SELECT '1_small' AS phase, 'v1' AS version, table_rows,
              |       d1.dv AS dv_rows,
              |       CAST(CASE WHEN d1.dv > 0 AND 20 * d1.dv >= table_rows
              |            THEN 1 ELSE 0 END AS INT) AS reconcile_recommended,
              |       CAST(CASE WHEN d1.dv > 0 AND 20 * d1.dv >= table_rows
              |            THEN 1 ELSE 0 END AS INT) AS fired,
              |       CASE WHEN d1.dv > 0 AND 20 * d1.dv >= table_rows
              |            THEN 'v2' ELSE 'v1' END AS version_after
              |FROM tot, d1
              |UNION ALL
              |SELECT '2_bulk', 'v1', table_rows, d2.dv,
              |       CAST(CASE WHEN d2.dv > 0 AND 20 * d2.dv >= table_rows
              |            THEN 1 ELSE 0 END AS INT),
              |       CAST(CASE WHEN d2.dv > 0 AND 20 * d2.dv >= table_rows
              |            THEN 1 ELSE 0 END AS INT),
              |       CASE WHEN d2.dv > 0 AND 20 * d2.dv >= table_rows
              |            THEN 'v2' ELSE 'v1' END
              |FROM tot, d2
              |ORDER BY phase""".stripMargin),
      doc = "deletion-vector reconcile census + trigger: sidecar rows vs " +
        "the manifest row count, reconcile_recommended at the documented " +
        "20·dv >= rows (5%) threshold — the 0.1% delete no-ops the " +
        "trigger, the accumulated 49% delete fires it (census and op " +
        "share the literal predicate)"),

    // ---- Metadata-only COUNT: every commit persists per-file footer
    // stats (_STATS), so `SELECT count(*)` on a healthy version is
    // O(files) METADATA work — zero data pages read — exactly how
    // Delta/Iceberg answer unfiltered counts. The upsert exercises
    // carried-file manifest reuse; the oracle recomputes the count the
    // slow way, proving the manifest number is the true one.
    GQuery("lake_metadata_count",
      (s, dir) => {
        import s.implicits._
        val src = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("price_cents"),
            col("o_orderstatus").as("status"))
        val mt = graft.stages.MergeTable.scratch(Seq("o_orderkey"))
        mt.replace(src.filter(col("o_orderkey") % 3 === 0))
        mt.upsert(src.filter(col("o_orderkey") % 3 === 1))
        val n = mt.manifestRowCount(mt.currentVersion.get)
          .getOrElse(sys.error("stats manifest incomplete — metadata count unavailable"))
        Seq((n, mt.listVersions.size.toLong))
          .toDF("n_rows_manifest", "n_versions")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows_manifest,
             |       CAST(2 AS BIGINT) AS n_versions
             |FROM orders WHERE o_orderkey % 3 IN (0, 1)""".stripMargin),
      doc = "metadata-only count: SELECT count(*) answered from the " +
        "version's per-file _STATS manifest (O(files), zero data pages; " +
        "carried files reuse their entries across the upsert) == the " +
        "oracle's full recount"),

    GQuery("lake_change_feed",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        // DML history: append → pruned UPDATE rewrite → DELETE → append.
        // The CDC scan between v0 and the head reads ONLY the files in the
        // symmetric difference of the two snapshots (carried hard links
        // are name-stable), and rows a group rewrite merely re-filed
        // cancel in the multiset diff — so the feed is the SEMANTIC
        // changes, O(changed data) at any table size.
        val (t, view) = freshTable(s, dir, "cdf")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey % 3 = 0")   // v0
        s.sql(s"UPDATE $t SET price_cents = price_cents + 19 " +
          "WHERE status = 'O' AND o_custkey % 4 = 1")                           // v1
        s.sql(s"DELETE FROM $t WHERE status = 'F' AND o_custkey % 5 = 2")       // v2
        s.sql(s"INSERT INTO $t SELECT o_orderkey + 5000000, o_custkey, " +
          s"price_cents, status FROM $view " +
          "WHERE o_orderkey % 3 = 1 AND o_orderkey < 9000")                     // v3
        val (_, mt) = storageHandle(s, t)
        mt.changesBetween(s, "v0", mt.currentVersion.get, Seq("o_orderkey"))
          .select(col("change_type"), col("o_orderkey"), col("o_custkey"),
            col("price_cents"), col("status"))
          .orderBy("change_type", "o_orderkey")
      },
      Some(s"""WITH o AS ($ordersCentsSql),
                    v0 AS (SELECT * FROM o WHERE o_orderkey % 3 = 0),
                    v1 AS (SELECT o_orderkey, o_custkey,
                                  CASE WHEN status = 'O' AND o_custkey % 4 = 1
                                       THEN price_cents + 19 ELSE price_cents END AS price_cents,
                                  status FROM v0),
                    v2 AS (SELECT * FROM v1 WHERE NOT (status = 'F' AND o_custkey % 5 = 2)),
                    fin AS (SELECT * FROM v2
                            UNION ALL
                            SELECT o_orderkey + 5000000, o_custkey, price_cents, status
                            FROM o WHERE o_orderkey % 3 = 1 AND o_orderkey < 9000),
                    pre AS (SELECT CASE WHEN b.o_orderkey IS NULL THEN 'delete'
                                        ELSE 'update_preimage' END AS change_type,
                                   a.o_orderkey, a.o_custkey, a.price_cents, a.status
                            FROM v0 a LEFT JOIN fin b ON a.o_orderkey = b.o_orderkey
                            WHERE b.o_orderkey IS NULL
                               OR a.price_cents <> b.price_cents
                               OR a.status <> b.status OR a.o_custkey <> b.o_custkey),
                    post AS (SELECT CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                                         ELSE 'update_postimage' END AS change_type,
                                    b.o_orderkey, b.o_custkey, b.price_cents, b.status
                             FROM fin b LEFT JOIN v0 a ON a.o_orderkey = b.o_orderkey
                             WHERE a.o_orderkey IS NULL
                                OR a.price_cents <> b.price_cents
                                OR a.status <> b.status OR a.o_custkey <> b.o_custkey)
               SELECT * FROM pre
               UNION ALL
               SELECT * FROM post
               ORDER BY change_type, o_orderkey"""),
      doc = "change data feed between snapshots (Delta-CDF-style insert/delete/" +
        "update_pre/postimage) derived from version immutability: only the " +
        "changed-file symmetric difference is read, rewrite-carried rows cancel"),

    GQuery("lake_incremental_refresh",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        // incremental materialized-view maintenance: the per-status
        // aggregate is materialized once from the v0 snapshot, then
        // brought to the table head by folding the SIGNED change feed
        // (insert/update_post add, delete/update_pre subtract) — a
        // delta-sized job where a naive refresh rescans the table. The
        // oracle recomputes the head state from scratch, proving the
        // incremental path lands on the identical aggregate.
        val (t, view) = freshTable(s, dir, "ivm")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey % 2 = 0")   // v0
        val base = s.sql(s"""SELECT status, count(*) AS n_rows,
                                    sum(price_cents) AS total_cents
                             FROM $t VERSION AS OF 'v0' GROUP BY status""")
        s.sql(s"UPDATE $t SET price_cents = price_cents + 3 WHERE o_custkey % 7 = 0")
        s.sql(s"DELETE FROM $t WHERE status = 'P'")
        s.sql(s"INSERT INTO $t SELECT * FROM $view " +
          "WHERE o_orderkey % 2 = 1 AND o_orderkey < 20000")
        val (_, mt) = storageHandle(s, t)
        val delta = mt
          .changesBetween(s, "v0", mt.currentVersion.get, Seq("o_orderkey"))
          .withColumn("sign",
            when(col("change_type").isin("insert", "update_postimage"), 1L)
              .otherwise(-1L))
          .groupBy("status")
          .agg(sum(col("sign")).as("d_rows"),
            sum(col("sign") * col("price_cents")).as("d_cents"))
        base.join(delta, Seq("status"), "full_outer")
          .select(col("status"),
            (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_rows"), lit(0L)))
              .as("n_rows"),
            (coalesce(col("total_cents"), lit(0L)) + coalesce(col("d_cents"), lit(0L)))
              .as("total_cents"))
          .where(col("n_rows") > 0)
          .orderBy("status")
      },
      Some(s"""WITH o AS ($ordersCentsSql),
                    v0 AS (SELECT * FROM o WHERE o_orderkey % 2 = 0),
                    v1 AS (SELECT o_orderkey, o_custkey,
                                  CASE WHEN o_custkey % 7 = 0 THEN price_cents + 3
                                       ELSE price_cents END AS price_cents, status
                           FROM v0),
                    v2 AS (SELECT * FROM v1 WHERE status <> 'P'),
                    fin AS (SELECT * FROM v2
                            UNION ALL
                            SELECT * FROM o WHERE o_orderkey % 2 = 1 AND o_orderkey < 20000)
               SELECT status, count(*) AS n_rows,
                      CAST(sum(price_cents) AS BIGINT) AS total_cents
               FROM fin GROUP BY status ORDER BY status"""),
      doc = "incremental materialized-view refresh: v0-materialized aggregate + " +
        "signed change-feed delta equals the from-scratch recompute of the head"),

    GQuery("lake_bloom_index",
      (s, dir) => {
        // three MODULUS inserts: every file's footer key range spans the
        // whole domain, so min/max pruning keeps everything — the bloom
        // sidecar is what narrows the point UPDATE/DELETE to the files
        // actually holding the key (LakeSpec asserts the carried set)
        val (t, view) = freshTable(s, dir, "bloomix",
          s"TBLPROPERTIES ('${graft.lake.GraftTable.FilterColumnsProp}'='o_orderkey')")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey % 3 = 0")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey % 3 = 1")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey % 3 = 2")
        val (_, mt) = storageHandle(s, t)
        graft.lake.GraftBloomIndex.build(s, mt, mt.currentVersion.get, Seq("o_orderkey"))
        val keys = Tables.orders(s, dir)
          .agg(min(col("o_orderkey")), max(col("o_orderkey"))).collect().head
        val (kLo, kHi) = (keys.getLong(0), keys.getLong(1))
        s.sql(s"UPDATE $t SET price_cents = price_cents + 7 WHERE o_orderkey = $kLo")
        s.sql(s"DELETE FROM $t WHERE o_orderkey = $kHi")
        s.sql(s"""SELECT status, count(*) AS n_rows, sum(price_cents) AS total_cents
                  FROM $t GROUP BY status ORDER BY status""")
      },
      Some(s"""WITH o AS ($ordersCentsSql),
                    k AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi FROM o),
                    fin AS (
                      SELECT o_orderkey,
                             CASE WHEN o_orderkey = (SELECT lo FROM k)
                                  THEN price_cents + 7 ELSE price_cents END AS price_cents,
                             status
                      FROM o WHERE o_orderkey <> (SELECT hi FROM k))
               SELECT status, count(*) AS n_rows,
                      CAST(sum(price_cents) AS BIGINT) AS total_cents
               FROM fin GROUP BY status ORDER BY status"""),
      doc = "per-file bloom index: point UPDATE/DELETE on a key-unclustered table " +
        "prune by bloom sidecar where footer ranges prune nothing"),

    GQuery("lake_incremental_join_refresh",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        // TWO-SIDED incremental view maintenance — the delta rule for a
        // JOIN view: with A' = A + ΔA and B' = B + ΔB,
        //   A'⋈B' − A⋈B  =  ΔA⋈B'  ∪  A⋈ΔB   (signed multisets),
        // so the materialized fact⋈dim aggregate is brought from the two
        // v0 snapshots to both table heads by two delta-sized joins —
        // never a rescan of either table. Signs multiply into the
        // aggregate (update = −pre ∪ +post), and rows moved BETWEEN
        // groups (the dim update re-nations customers) cancel here and
        // reappear there. Oracle: the from-scratch head join-aggregate.
        val (tA, viewA) = freshTable(s, dir, "ijra")
        s.sql(s"INSERT INTO $tA SELECT * FROM $viewA WHERE o_orderkey % 2 = 0")  // A v0
        val idB = seq.incrementAndGet()
        val viewB = s"lake_cust_ijr_$idB"
        Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"))
          .createOrReplaceTempView(viewB)
        val tB = s"graftlake.q.ijrb_$idB"
        s.sql(s"CREATE TABLE $tB (c_custkey BIGINT, c_nationkey BIGINT)")
        s.sql(s"INSERT INTO $tB SELECT * FROM $viewB WHERE c_custkey % 3 <> 0")  // B v0
        val base = s.sql(
          s"""SELECT b.c_nationkey, count(*) AS n_rows,
                     sum(a.price_cents) AS total_cents
              FROM $tA VERSION AS OF 'v0' a
              JOIN $tB VERSION AS OF 'v0' b ON a.o_custkey = b.c_custkey
              GROUP BY b.c_nationkey""")
        // advance BOTH tables past their materialized snapshots
        s.sql(s"UPDATE $tA SET price_cents = price_cents + 3 WHERE o_custkey % 7 = 0")
        s.sql(s"DELETE FROM $tA WHERE status = 'P'")
        s.sql(s"INSERT INTO $tA SELECT * FROM $viewA " +
          "WHERE o_orderkey % 2 = 1 AND o_orderkey < 20000")
        s.sql(s"UPDATE $tB SET c_nationkey = 99 WHERE c_custkey % 11 = 0")
        s.sql(s"INSERT INTO $tB SELECT * FROM $viewB WHERE c_custkey % 3 = 0")
        val (_, mtA) = storageHandle(s, tA)
        val (_, mtB) = storageHandle(s, tB)
        def signed(df: DataFrame): DataFrame = df.withColumn("sign",
          when(col("change_type").isin("insert", "update_postimage"), 1L)
            .otherwise(-1L))
        val dA = signed(mtA.changesBetween(s, "v0", mtA.currentVersion.get,
          Seq("o_orderkey")))
        val dB = signed(mtB.changesBetween(s, "v0", mtB.currentVersion.get,
          Seq("c_custkey")))
        val bHead = s.sql(s"SELECT * FROM $tB")
        val aOld = s.sql(s"SELECT * FROM $tA VERSION AS OF 'v0'")
        val delta = dA.join(bHead, col("o_custkey") === col("c_custkey"))
            .select(col("c_nationkey"), col("sign"), col("price_cents"))
          .unionByName(
            aOld.join(dB, col("o_custkey") === col("c_custkey"))
              .select(col("c_nationkey"), col("sign"), col("price_cents")))
          .groupBy(col("c_nationkey"))
          .agg(sum(col("sign")).as("d_rows"),
            sum(col("sign") * col("price_cents")).as("d_cents"))
        base.join(delta, Seq("c_nationkey"), "full_outer")
          .select(col("c_nationkey"),
            (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_rows"), lit(0L)))
              .as("n_rows"),
            (coalesce(col("total_cents"), lit(0L)) + coalesce(col("d_cents"), lit(0L)))
              .as("total_cents"))
          .where(col("n_rows") > 0)
          .orderBy("c_nationkey")
      },
      Some(s"""WITH o AS ($ordersCentsSql),
                    c AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey
                          FROM customer),
                    a0 AS (SELECT * FROM o WHERE o_orderkey % 2 = 0),
                    a1 AS (SELECT o_orderkey, o_custkey,
                                  CASE WHEN o_custkey % 7 = 0 THEN price_cents + 3
                                       ELSE price_cents END AS price_cents, status
                           FROM a0),
                    a2 AS (SELECT * FROM a1 WHERE status <> 'P'),
                    afin AS (SELECT * FROM a2
                             UNION ALL
                             SELECT * FROM o WHERE o_orderkey % 2 = 1 AND o_orderkey < 20000),
                    b0 AS (SELECT * FROM c WHERE c_custkey % 3 <> 0),
                    b1 AS (SELECT c_custkey,
                                  CASE WHEN c_custkey % 11 = 0 THEN 99
                                       ELSE c_nationkey END AS c_nationkey
                           FROM b0),
                    bfin AS (SELECT * FROM b1
                             UNION ALL
                             SELECT * FROM c WHERE c_custkey % 3 = 0)
               SELECT b.c_nationkey, count(*) AS n_rows,
                      CAST(sum(a.price_cents) AS BIGINT) AS total_cents
               FROM afin a JOIN bfin b ON a.o_custkey = b.c_custkey
               GROUP BY b.c_nationkey ORDER BY b.c_nationkey"""),
      doc = "two-sided incremental JOIN-view refresh: ΔA⋈B' ∪ A⋈ΔB signed " +
        "change-feed deltas bring the fact⋈dim aggregate to both heads " +
        "without rescanning either table"),

    GQuery("lake_metadata_delete",
      (s, dir) => {
        // both deletes align with whole-file key ranges, so footer stats
        // prove every file all-match or no-match and the statements commit
        // as metadata-only deletes (zero data rows read) — the correctness
        // claim is that dropping files IS the declarative delete
        // each insert's files stay inside its key range, so BOTH deletes
        // align with whole files: < 15000 drops the first insert's files,
        // >= 45000 drops the fourth's — no file straddles either bound
        val (t, view) = freshTable(s, dir, "mdel")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey < 15000")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey >= 15000 AND o_orderkey < 30000")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey >= 30000 AND o_orderkey < 45000")
        s.sql(s"INSERT INTO $t SELECT * FROM $view WHERE o_orderkey >= 45000")
        s.sql(s"DELETE FROM $t WHERE o_orderkey < 15000")
        s.sql(s"DELETE FROM $t WHERE o_orderkey >= 45000")
        s.sql(s"""SELECT status, count(*) AS n_rows, sum(price_cents) AS total_cents,
                         min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
                  FROM $t GROUP BY status ORDER BY status""")
      },
      Some(s"""WITH o AS ($ordersCentsSql)
               SELECT status, count(*) AS n_rows,
                      CAST(sum(price_cents) AS BIGINT) AS total_cents,
                      CAST(min(o_orderkey) AS BIGINT) AS min_key,
                      CAST(max(o_orderkey) AS BIGINT) AS max_key
               FROM o WHERE o_orderkey >= 15000 AND o_orderkey < 45000
               GROUP BY status ORDER BY status"""),
      doc = "metadata-only DELETE: both predicates align with whole-file key " +
        "ranges (insert-bounded), so footer proofs drop files without reading " +
        "data; result matches the declarative range filter"),

    // ---- TIMESTAMP AS OF time travel: the commit wall-clock log
    // (_VERSION_LOG, appended under the commit lock) resolves a point in
    // time to the newest version committed at or before it — the audit
    // form of time travel ("what did the ledger say when the report
    // ran?"). The query pins the instant right after the first commit,
    // busy-waits one tick so the next commit's log line is strictly
    // later, then proves the resolved read equals the v0 content even
    // though the table has moved on.
    GQuery("lake_timestamp_travel",
      (s, dir) => {
        val base = Tables.orders(s, dir).filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus").as("status"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("cents"))
        val t = graft.stages.MergeTable.scratch(Seq("o_orderkey"))
        t.replace(base)                                           // v0
        val afterV0 = t.versionLog.last._2
        while (System.currentTimeMillis() <= afterV0) Thread.sleep(1)
        t.upsert(base.withColumn("cents", col("cents") + 999))    // v1 (noise)
        val v = t.versionAsOfTime(afterV0)
          .getOrElse(sys.error("timestamp resolved to no version"))
        t.readVersion(s, v)
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
          .orderBy(col("status"))
      },
      Some("""SELECT o_orderstatus AS status, count(*) AS n_rows,
                     CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_cents
              FROM orders WHERE o_orderkey % 5 = 0
              GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      doc = "TIMESTAMP AS OF resolution against the commit log: the pinned " +
        "instant reads v0 content although the table head has moved on"),

    // ---- VACUUM retention: three commits, then retention keeps the
    // newest two — the vacuumed version's row disappears from the time-
    // travel surface (retained = 0, censuses NULL) while the survivors
    // still read their immutable snapshots. The RETAINED SET comes from
    // the table's own listVersions after the vacuum, so a retention bug
    // (dropping too much or too little) breaks the oracle compare, not
    // just a spec. At 100 TB retention is the storage-cost knob: old
    // versions are what time travel reads, vacuum is the policy that
    // caps how many you pay for.
    GQuery("lake_vacuum_retention",
      (s, dir) => {
        val base = Tables.orders(s, dir).filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_orderstatus").as("status"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("cents"))
        val t = graft.stages.MergeTable.scratch(Seq("o_orderkey"))
        t.replace(base)                                               // v0
        t.upsert(base.filter(col("status") === "O")
          .withColumn("cents", col("cents") + 10))                    // v1
        t.replace(base.filter(col("o_orderkey") % 14 === 0))          // v2
        t.vacuum(keepLast = 2)
        val retained = t.listVersions.toSet
        Seq("v0", "v1", "v2").map { v =>
          if (retained(v))
            t.readVersion(s, v)
              .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
              .select(lit(v).as("version"), lit(1).as("retained"),
                col("n_rows"), col("sum_cents"))
          else
            s.sql(s"SELECT '$v' AS version, 0 AS retained, " +
              "CAST(NULL AS BIGINT) AS n_rows, CAST(NULL AS BIGINT) AS sum_cents")
        }.reduce(_ unionByName _).orderBy(col("version"))
      },
      Some("""WITH b AS (SELECT o_orderkey, o_orderstatus AS status,
              |                 CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
              |          FROM orders WHERE o_orderkey % 7 = 0),
              |v1 AS (SELECT CASE WHEN status = 'O' THEN cents + 10
              |                   ELSE cents END AS cents FROM b),
              |v2 AS (SELECT cents FROM b WHERE o_orderkey % 14 = 0)
              |SELECT 'v0' AS version, 0 AS retained,
              |       CAST(NULL AS BIGINT) AS n_rows, CAST(NULL AS BIGINT) AS sum_cents
              |UNION ALL
              |SELECT 'v1', 1, count(*), CAST(SUM(cents) AS BIGINT) FROM v1
              |UNION ALL
              |SELECT 'v2', 1, count(*), CAST(SUM(cents) AS BIGINT) FROM v2
              |ORDER BY version""".stripMargin),
      doc = "VACUUM retention policy: 3 commits, keepLast=2 — the dropped " +
        "version leaves the time-travel surface (retained flag from the " +
        "table's own version list), survivors still census their immutable " +
        "snapshots"),

    // ---- Zero-copy shallow clone: the cloned version's files become v0
    // of a NEW table via hard links (O(files) metadata, no data bytes
    // moved — at 100 TB an instant fork vs a multi-hour copy), then the
    // two tables DIVERGE: the source bumps one key subset, the clone
    // doubles another, and the combined census proves neither write leaked
    // into the other. Isolation is inherited from version immutability —
    // no commit path ever mutates a shared file in place. MergeTableSpec pins
    // the physical claims (shared inodes at clone time; clone survives a
    // source vacuum of the cloned version).
    GQuery("lake_shallow_clone",
      (s, dir) => {
        val base = Tables.orders(s, dir).filter(col("o_orderkey") % 4 === 0)
          .select(col("o_orderkey"), col("o_orderstatus").as("status"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("cents"))
        val src = graft.stages.MergeTable.scratch(Seq("o_orderkey"))
        src.replace(base)
        val clone = src.cloneShallow(src.currentVersion.get,
          graft.stages.TempDirs.scratch("graft_clone_"))
        src.upsert(base.filter(col("o_orderkey") % 8 === 0)
          .withColumn("cents", col("cents") + 100))
        clone.upsert(base.filter(col("o_orderkey") % 12 === 0)
          .withColumn("cents", col("cents") * 2))
        val schema = org.apache.spark.sql.types.StructType(Seq())
        src.read(s, schema).withColumn("side", lit("source"))
          .unionByName(clone.read(s, schema).withColumn("side", lit("clone")))
          .groupBy(col("side"), col("status"))
          .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
          .orderBy(col("side"), col("status"))
      },
      Some("""WITH b AS (SELECT o_orderkey, o_orderstatus AS status,
                                CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                         FROM orders WHERE o_orderkey % 4 = 0),
                   srcf AS (SELECT status,
                                   CASE WHEN o_orderkey % 8 = 0
                                        THEN cents + 100 ELSE cents END AS cents FROM b),
                   clonef AS (SELECT status,
                                     CASE WHEN o_orderkey % 12 = 0
                                          THEN cents * 2 ELSE cents END AS cents FROM b),
                   u AS (SELECT 'source' AS side, status, cents FROM srcf
                         UNION ALL
                         SELECT 'clone' AS side, status, cents FROM clonef)
              SELECT side, status, count(*) AS n_rows,
                     CAST(SUM(cents) AS BIGINT) AS sum_cents
              FROM u GROUP BY side, status ORDER BY side, status"""),
      doc = "hard-link shallow clone then divergent writes on source and clone: " +
        "combined census proves zero-copy fork isolation (no cross-leak)")
  )
}
