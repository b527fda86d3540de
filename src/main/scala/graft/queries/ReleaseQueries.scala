package graft.queries

import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.ops.Dedup

/** The end-to-end corpus-release pipeline query ([[graft.ops.Curate
  * .releaseCorpus]]) and its DuckDB oracle — the oracle replays every
  * chained stage (span cut keep-one → paragraph dedup → quality/repetition
  * gate → near-dup-aware train split → temperature mixture → shard
  * manifest) over the same parquet, composed from the per-stage oracle
  * fragments each component query already proves in isolation
  * (`dedup_substring_cut_keepone`, `dedup_paragraphs`, `curate_corpus`'s
  * quality gate, `text_repetition`, `dedup_aware_split`, `prep_mix_apply`,
  * `prep_shard_manifest`). Key CTEs are MATERIALIZED: DuckDB inlines CTEs
  * by default and the chain references each stage repeatedly.
  */
object ReleaseQueries {

  private val P = Dedup.P
  private val budget = 300L

  /** Stage-1 span cut (keep-one) producing `c1(doc_id, text, lang)` —
    * the dedup_substring_cut_keepone oracle's CTE chain with the final
    * fingerprint select replaced by the cleaned text itself.
    */
  private def spanCutCtes: String = {
    val w = 48; val W = 8
    val pows = Iterator.iterate(1L)(p => p * 131L % 1000000007L).take(w).toSeq
    s"""codes AS MATERIALIZED (
       |  SELECT doc_id, text, length(text) AS L,
       |         list_transform(range(1, length(text) + 1),
       |                        i -> ascii(substr(text, i, 1))) AS cs
       |  FROM documents),
       |hs AS MATERIALIZED (
       |  SELECT doc_id, text,
       |         list_transform(range($w, L + 1),
       |           i -> list_sum(list_transform(range(0, $w),
       |                  k -> CAST(cs[CAST(i - k AS INT)] AS BIGINT)
       |                       * [${pows.mkString(", ")}][CAST(k AS INT) + 1]))
       |                % 1000000007) AS h
       |  FROM codes WHERE L >= $w + $W - 1),
       |sel AS MATERIALIZED (
       |  SELECT doc_id, text,
       |         list_distinct(list_transform(range(1, len(h) - $W + 2),
       |           a -> a + list_position(list_slice(h, a, a + $W - 1),
       |                                  list_min(list_slice(h, a, a + $W - 1))) - 1)) AS ps
       |  FROM hs),
       |grams AS MATERIALIZED (
       |  SELECT doc_id, p, md5(substr(text, p, $w)) AS g
       |  FROM (SELECT doc_id, text, CAST(unnest(ps) AS INT) AS p FROM sel)),
       |gfreq AS (SELECT g, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS min_doc
       |          FROM grams GROUP BY g),
       |shared AS MATERIALIZED (
       |  SELECT gr.doc_id, gr.p FROM grams gr JOIN gfreq f USING (g)
       |  WHERE f.n_docs > 1 AND gr.doc_id <> f.min_doc),
       |flagged AS (
       |  SELECT doc_id, p,
       |         CASE WHEN lag(p) OVER wp IS NULL
       |                OR p <= lag(p) OVER wp + $w THEN 0 ELSE 1 END AS flag
       |  FROM shared WINDOW wp AS (PARTITION BY doc_id ORDER BY p)),
       |islands AS (
       |  SELECT doc_id, p,
       |         sum(flag) OVER (PARTITION BY doc_id ORDER BY p
       |                         ROWS UNBOUNDED PRECEDING) AS island
       |  FROM flagged),
       |spans AS (
       |  SELECT doc_id, min(p) AS s, max(p) + ${w - 1} AS e
       |  FROM islands GROUP BY doc_id, island),
       |pieces AS (
       |  SELECT doc_id, s, e,
       |         COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS prev_e
       |  FROM spans),
       |assembled AS MATERIALIZED (
       |  SELECT p.doc_id,
       |         string_agg(substr(d.text, p.prev_e + 1, p.s - p.prev_e - 1),
       |                    '' ORDER BY p.s)
       |           || substr(any_value(d.text), max(p.e) + 1) AS clean
       |  FROM pieces p JOIN documents d USING (doc_id)
       |  GROUP BY p.doc_id),
       |c1 AS MATERIALIZED (
       |  SELECT d.doc_id, COALESCE(a.clean, d.text) AS text, d.lang
       |  FROM documents d LEFT JOIN assembled a USING (doc_id))""".stripMargin
  }

  /** Stage 2: paragraph/boilerplate removal over c1 → c2 (the
    * dedup_paragraphs oracle, source swapped).
    */
  private def paragraphCtes: String =
    s"""t2 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM c1),
       |e2 AS (SELECT doc_id, toks,
       |              unnest(range(0, CAST(ceil(len(toks) / 4.0) AS BIGINT))) AS i
       |       FROM t2),
       |segs2 AS MATERIALIZED (
       |  SELECT doc_id, i AS seg_no,
       |         array_to_string(list_slice(toks, CAST(i * 4 + 1 AS INT),
       |                                    CAST(i * 4 + 4 AS INT)), ' ') AS seg
       |  FROM e2),
       |bp2 AS (SELECT md5(seg) AS h FROM segs2
       |        GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
       |re2 AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_no) AS clean
       |        FROM segs2 WHERE md5(seg) NOT IN (SELECT h FROM bp2)
       |        GROUP BY doc_id),
       |c2 AS MATERIALIZED (
       |  SELECT c1.doc_id, COALESCE(re2.clean, '') AS text, c1.lang
       |  FROM c1 LEFT JOIN re2 USING (doc_id))""".stripMargin

  /** Stage 3: quality (curate_corpus's gate) + repetition
    * (text_repetition's flags) over c2 → c3.
    */
  private def qualityCtes: String =
    s"""feat AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |           / len(string_split(text, ' ')) AS ttr,
       |         CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
       |           / len(string_split(text, ' ')) AS mtl
       |  FROM c2),
       |tok3 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM c2),
       |topc AS (SELECT doc_id, max(c) AS top_cnt FROM (
       |           SELECT doc_id, t, count(*) AS c FROM tok3 GROUP BY 1, 2)
       |         GROUP BY doc_id),
       |bg3 AS (
       |  SELECT doc_id, len(toks) AS n_tokens,
       |         CASE WHEN len(toks) >= 2
       |              THEN list_transform(range(1, len(toks)),
       |                     i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])
       |              ELSE CAST([] AS VARCHAR[]) END AS bgs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM c2)),
       |rep AS (
       |  SELECT b.doc_id,
       |         CAST(t.top_cnt AS DOUBLE) / b.n_tokens AS ttf,
       |         CASE WHEN len(b.bgs) > 0
       |              THEN CAST(len(b.bgs) - len(list_distinct(b.bgs)) AS DOUBLE) / len(b.bgs)
       |              ELSE 0.0 END AS dbf
       |  FROM bg3 b JOIN topc t USING (doc_id)),
       |c3 AS MATERIALIZED (
       |  SELECT c2.doc_id, c2.text, c2.lang FROM c2
       |  JOIN feat f USING (doc_id)
       |  JOIN rep r USING (doc_id)
       |  WHERE f.n_tokens >= 20 AND f.ttr >= 0.3 AND f.mtl >= 2.0 AND f.mtl <= 12.0
       |    AND NOT (r.ttf > 0.2 OR r.dbf > 0.2))""".stripMargin

  /** Stage 4: near-dup-aware train split over c3 → c4 (minhash pairs +
    * recursive closure + cluster-hash bucket, the dedup_aware_split rule).
    */
  private def splitCtes: String = {
    val n = Dedup.defaultShingle
    val hbase =
      s"""list_distinct(list_transform(range(0, len(string_split(text, ' ')) - $n + 1),
         |  i -> CAST('0x' || substr(md5(array_to_string(list_slice(string_split(text, ' '), i + 1, i + $n), ' ')), 1, 15) AS BIGINT) % $P))""".stripMargin
    val sig =
      s"""list_transform(range(0, ${Dedup.numHashes}),
         |  i -> list_min(list_transform(hbase,
         |    h -> ((1103515245 * (i + 1)) % $P * h + 12345 + 769 * i) % $P)))""".stripMargin
    s"""sh3 AS MATERIALIZED (
       |  SELECT doc_id, $hbase AS hbase
       |  FROM c3 WHERE len(string_split(text, ' ')) >= $n),
       |sigs3 AS (SELECT doc_id, hbase, $sig AS sig FROM sh3),
       |bandrows3 AS MATERIALIZED (
       |  SELECT doc_id, b.band,
       |         array_to_string(list_transform(
       |           list_slice(sig, b.band * ${Dedup.rowsPerBand} + 1,
       |                      b.band * ${Dedup.rowsPerBand} + ${Dedup.rowsPerBand}),
       |           x -> CAST(x AS VARCHAR)), ',') AS band_key
       |  FROM sigs3, (SELECT unnest(range(0, ${Dedup.bands})) AS band) b),
       |cand3 AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bandrows3 a JOIN bandrows3 b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id),
       |pairs3 AS MATERIALIZED (
       |  SELECT c.doc_a, c.doc_b
       |  FROM cand3 c
       |  JOIN sh3 sa ON sa.doc_id = c.doc_a
       |  JOIN sh3 sb ON sb.doc_id = c.doc_b
       |  WHERE CAST(len(list_intersect(sa.hbase, sb.hbase)) AS DOUBLE)
       |          / (len(sa.hbase) + len(sb.hbase) - len(list_intersect(sa.hbase, sb.hbase))) >= 0.5),
       |edges3 AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs3
       |  UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs3),
       |reach3(node, r) AS (
       |  SELECT DISTINCT a, a FROM edges3
       |  UNION
       |  SELECT e.a, reach3.r FROM edges3 e JOIN reach3 ON reach3.node = e.b),
       |comp3 AS (SELECT node, min(r) AS comp FROM reach3 GROUP BY node),
       |c4 AS MATERIALIZED (
       |  SELECT doc_id, text, lang FROM (
       |    SELECT c3.doc_id, c3.text, c3.lang,
       |           COALESCE(p.comp, c3.doc_id) AS cluster
       |    FROM c3 LEFT JOIN comp3 p ON p.node = c3.doc_id)
       |  WHERE CAST('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 4) AS BIGINT) % 100 >= 10)""".stripMargin
  }

  /** Stage 5: temperature-mixture application over c4 → c5 (the
    * prep_mix_apply thresholds at budget=$budget).
    */
  private def mixtureCtes: String =
    s"""mc AS (SELECT lang, count(*) AS n_docs FROM c4 GROUP BY lang),
       |mw AS (SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS weight FROM mc),
       |mt AS (SELECT list_sum(list(weight ORDER BY lang NULLS FIRST)) AS w_total FROM mw),
       |mix AS (
       |  SELECT lang,
       |         10000 * CAST(floor(weight / w_total * $budget) AS BIGINT) // n_docs AS threshold
       |  FROM mw, mt),
       |c5 AS MATERIALIZED (
       |  SELECT c4.doc_id, c4.text, c4.lang
       |  FROM c4 JOIN mix ON mix.lang IS NOT DISTINCT FROM c4.lang
       |  WHERE CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000
       |        < mix.threshold)""".stripMargin

  private def funnelRow(stage: String, src: String): String =
    s"""SELECT '$stage' AS stage, CAST(0 AS INT) AS shard, count(*) AS n_docs,
       |       CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
       |       bit_xor(CAST('0x' || substr(md5(doc_id || '|' || text), 1, 15) AS BIGINT)) AS checksum
       |FROM $src""".stripMargin

  // NOTE: plain concatenation, no outer stripMargin — a second stripMargin
  // over the interpolated (already-stripped) fragments would eat the
  // leading pipe of every `|| substr(...)` continuation line
  private lazy val releaseSql: String =
    "WITH RECURSIVE " + spanCutCtes + ",\n" +
      paragraphCtes + ",\n" +
      qualityCtes + ",\n" +
      splitCtes + ",\n" +
      mixtureCtes + "\n" +
      funnelRow("0_raw", "documents") +
      "\nUNION ALL " + funnelRow("1_span_cut", "c1") +
      "\nUNION ALL " + funnelRow("2_paragraph", "c2") +
      "\nUNION ALL " + funnelRow("3_quality", "c3") +
      "\nUNION ALL " + funnelRow("4_train", "c4") +
      "\nUNION ALL " + funnelRow("5_mixture", "c5") +
      """
        |UNION ALL
        |SELECT '6_shard' AS stage, CAST(doc_id % 16 AS INT) AS shard, count(*) AS n_docs,
        |       CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
        |       bit_xor(CAST('0x' || substr(md5(doc_id || '|' || text), 1, 15) AS BIGINT)) AS checksum
        |FROM c5 GROUP BY 2
        |ORDER BY stage, shard""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("curate_release_e2e",
      (s, dir) => graft.ops.Curate.releaseCorpus(Tables.documents(s, dir),
          graft.stages.MergeTable.scratch(Seq("doc_id")), budget = budget)
        .orderBy(col("stage"), col("shard")),
      Some(releaseSql),
      doc = "end-to-end corpus release: span cut (keep-one) -> paragraph dedup " +
        "-> quality+repetition gate -> near-dup-aware train split -> " +
        "temperature mixture -> durable MergeTable commit -> shard manifest " +
        "served from the table; funnel census + manifest, every stage " +
        "replayed by the composed oracle"),

    // ---- Incremental re-release: two half-corpus batches through
    // Curate.releaseIncremental against the SAME persisted archive/index/
    // pair tables; the oracle is the single-shot from-scratch chain over
    // the full corpus — green means batch-split transparency of the whole
    // release (exact dedup arbitration, cross-batch near-dup pairs,
    // cluster-aware split, recomputed global mixture, manifest).
    GQuery("curate_release_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val archive = graft.stages.MergeTable.scratch(Seq("doc_id"))
        val index = graft.stages.MergeTable.scratch(Seq("doc_id"))
        val pairs = graft.stages.MergeTable.scratch(Seq("doc_a", "doc_b"))
        graft.ops.Curate.releaseIncremental(
          docs.filter(col("doc_id") % 2 === 0), archive, index, pairs)
        graft.ops.Curate.releaseIncremental(
          docs.filter(col("doc_id") % 2 === 1), archive, index, pairs)
          .orderBy(col("stage"), col("shard"))
      },
      Some(releaseIncrementalSql),
      doc = "incremental corpus re-release: per-batch text scan + persisted " +
        "archive/index/pair tables converge to the from-scratch release " +
        "funnel + shard manifest (shared single-shot oracle)"),

    // ---- Release-over-release DIFF card: what changed between two
    // committed index versions — per-language docs/tokens added and
    // removed (removals are exact-dedup EVICTIONS: a later batch carried
    // the same text under a smaller id). Reads the narrow index snapshots
    // only (the v1 snapshot is checkpointed before the second run so the
    // pointer-flip cannot alias it); the oracle recomputes both canon
    // sets from scratch. The per-release governance readout a corpus
    // changelog ships.
    GQuery("curate_release_diff",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val archive = graft.stages.MergeTable.scratch(Seq("doc_id"))
        val index = graft.stages.MergeTable.scratch(Seq("doc_id"))
        val pairs = graft.stages.MergeTable.scratch(Seq("doc_a", "doc_b"))
        graft.ops.Curate.releaseIncremental(
          docs.filter(col("doc_id") % 2 === 0), archive, index, pairs)
        val v1 = index.read(s, graft.ops.Curate.indexSchema)
          .select(col("doc_id"), col("labeled_lang").as("lang"),
            col("n_tokens").cast("long").as("n_tokens"))
          .localCheckpoint(true) // snapshot BEFORE the next commit
        graft.ops.Curate.releaseIncremental(
          docs.filter(col("doc_id") % 2 === 1), archive, index, pairs)
        val v2 = index.read(s, graft.ops.Curate.indexSchema)
          .select(col("doc_id"), col("labeled_lang").as("lang"),
            col("n_tokens").cast("long").as("n_tokens"))
        val added = v2.join(v1.select("doc_id"), Seq("doc_id"), "left_anti")
        val removed = v1.join(v2.select("doc_id"), Seq("doc_id"), "left_anti")
        v1.withColumn("tag", lit("v1"))
          .unionByName(v2.withColumn("tag", lit("v2")))
          .unionByName(added.withColumn("tag", lit("add")))
          .unionByName(removed.withColumn("tag", lit("rem")))
          .groupBy(col("lang"))
          .agg(
            count(when(col("tag") === "v1", 1)).as("n_v1"),
            sum(when(col("tag") === "v1", col("n_tokens")).otherwise(0L)).as("tok_v1"),
            count(when(col("tag") === "v2", 1)).as("n_v2"),
            sum(when(col("tag") === "v2", col("n_tokens")).otherwise(0L)).as("tok_v2"),
            count(when(col("tag") === "add", 1)).as("n_added"),
            sum(when(col("tag") === "add", col("n_tokens")).otherwise(0L)).as("tok_added"),
            count(when(col("tag") === "rem", 1)).as("n_removed"),
            sum(when(col("tag") === "rem", col("n_tokens")).otherwise(0L)).as("tok_removed"))
          .orderBy(col("lang").asc_nulls_first)
      },
      Some("""WITH c1 AS MATERIALIZED (
              |  SELECT d.doc_id, d.lang,
              |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
              |  FROM documents d
              |  JOIN (SELECT min(doc_id) AS doc_id FROM documents
              |        WHERE doc_id % 2 = 0 GROUP BY md5(text)) k USING (doc_id)),
              |c2 AS MATERIALIZED (
              |  SELECT d.doc_id, d.lang,
              |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
              |  FROM documents d
              |  JOIN (SELECT min(doc_id) AS doc_id FROM documents
              |        GROUP BY md5(text)) k USING (doc_id)),
              |tagged AS (
              |  SELECT lang, n_tokens, 'v1' AS tag FROM c1
              |  UNION ALL SELECT lang, n_tokens, 'v2' FROM c2
              |  UNION ALL
              |  SELECT lang, n_tokens, 'add' FROM c2
              |  WHERE NOT EXISTS (SELECT 1 FROM c1 WHERE c1.doc_id = c2.doc_id)
              |  UNION ALL
              |  SELECT lang, n_tokens, 'rem' FROM c1
              |  WHERE NOT EXISTS (SELECT 1 FROM c2 WHERE c2.doc_id = c1.doc_id))
              |SELECT lang,
              |       CAST(count(*) FILTER (tag = 'v1') AS BIGINT) AS n_v1,
              |       CAST(COALESCE(SUM(n_tokens) FILTER (tag = 'v1'), 0) AS BIGINT) AS tok_v1,
              |       CAST(count(*) FILTER (tag = 'v2') AS BIGINT) AS n_v2,
              |       CAST(COALESCE(SUM(n_tokens) FILTER (tag = 'v2'), 0) AS BIGINT) AS tok_v2,
              |       CAST(count(*) FILTER (tag = 'add') AS BIGINT) AS n_added,
              |       CAST(COALESCE(SUM(n_tokens) FILTER (tag = 'add'), 0) AS BIGINT) AS tok_added,
              |       CAST(count(*) FILTER (tag = 'rem') AS BIGINT) AS n_removed,
              |       CAST(COALESCE(SUM(n_tokens) FILTER (tag = 'rem'), 0) AS BIGINT) AS tok_removed
              |FROM tagged GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin),
      doc = "release-over-release diff card: per-language canon docs/tokens " +
        "added and removed (exact-dedup evictions) between two committed " +
        "index versions — the corpus changelog readout, narrow index " +
        "columns only")
  )

  /** From-scratch oracle of the incremental release: exact dedup →
    * quality gate → near-dup clusters (LSH + verify + recursive closure)
    * → cluster-hash train split → temperature mixture → funnel + shard
    * manifest, over the FULL documents table in one shot. CTEs
    * MATERIALIZED (each stage referenced repeatedly).
    */
  private lazy val releaseIncrementalSql: String = {
    val n = Dedup.defaultShingle
    val hbase =
      s"""list_distinct(list_transform(range(0, len(string_split(text, ' ')) - $n + 1),
         |  i -> CAST('0x' || substr(md5(array_to_string(list_slice(string_split(text, ' '), i + 1, i + $n), ' ')), 1, 15) AS BIGINT) % $P))""".stripMargin
    val sig =
      s"""list_transform(range(0, ${Dedup.numHashes}),
         |  i -> list_min(list_transform(hbase,
         |    h -> ((1103515245 * (i + 1)) % $P * h + 12345 + 769 * i) % $P)))""".stripMargin
    val chk = "bit_xor(CAST('0x' || substr(md5(doc_id || '|' || text_md5), 1, 15) AS BIGINT))"
    def funnel(stage: String, src: String): String =
      s"""SELECT '$stage' AS stage, CAST(0 AS INT) AS shard,
         |       count(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |       $chk AS checksum
         |FROM $src""".stripMargin
    s"""WITH RECURSIVE base AS MATERIALIZED (
       |  SELECT d.doc_id, d.text, d.lang, md5(d.text) AS text_md5,
       |         len(string_split(d.text, ' ')) AS n_tokens
       |  FROM documents d
       |  JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)) c
       |    USING (doc_id)),
       |qual AS MATERIALIZED (
       |  SELECT * FROM base
       |  WHERE n_tokens >= 20
       |    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |          / n_tokens >= 0.3
       |    AND CAST(length(text) - n_tokens + 1 AS DOUBLE) / n_tokens
       |          BETWEEN 2.0 AND 12.0),
       |shq AS MATERIALIZED (
       |  SELECT doc_id, $hbase AS hbase
       |  FROM qual WHERE len(string_split(text, ' ')) >= $n),
       |sigsq AS MATERIALIZED (SELECT doc_id, hbase, $sig AS sig FROM shq),
       |bandq AS MATERIALIZED (
       |  SELECT doc_id, b.band,
       |         array_to_string(list_transform(
       |           list_slice(sig, b.band * ${Dedup.rowsPerBand} + 1,
       |                      b.band * ${Dedup.rowsPerBand} + ${Dedup.rowsPerBand}),
       |           x -> CAST(x AS VARCHAR)), ',') AS band_key
       |  FROM sigsq, (SELECT unnest(range(0, ${Dedup.bands})) AS band) b),
       |candq AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bandq a JOIN bandq b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id),
       |pairsq AS MATERIALIZED (
       |  SELECT c.doc_a, c.doc_b
       |  FROM candq c
       |  JOIN shq sa ON sa.doc_id = c.doc_a
       |  JOIN shq sb ON sb.doc_id = c.doc_b
       |  WHERE CAST(len(list_intersect(sa.hbase, sb.hbase)) AS DOUBLE)
       |          / (len(sa.hbase) + len(sb.hbase)
       |             - len(list_intersect(sa.hbase, sb.hbase))) >= 0.5),
       |edgesq AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairsq
       |  UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairsq),
       |reachq(node, r) AS (
       |  SELECT DISTINCT a, a FROM edgesq
       |  UNION
       |  SELECT e.a, reachq.r FROM edgesq e JOIN reachq ON reachq.node = e.b),
       |compq AS (SELECT node, min(r) AS comp FROM reachq GROUP BY node),
       |trainf AS MATERIALIZED (
       |  SELECT doc_id, text_md5, n_tokens, lang FROM (
       |    SELECT q.doc_id, q.text_md5, q.n_tokens, q.lang,
       |           COALESCE(p.comp, q.doc_id) AS cluster
       |    FROM qual q LEFT JOIN compq p ON p.node = q.doc_id)
       |  WHERE CAST('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 4) AS BIGINT)
       |          % 100 >= 10),
       |mc AS (SELECT lang, count(*) AS n_docs FROM trainf GROUP BY lang),
       |mw AS (SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS weight FROM mc),
       |mt AS (SELECT list_sum(list(weight ORDER BY lang NULLS FIRST)) AS w_total
       |       FROM mw),
       |mix AS (
       |  SELECT lang,
       |         10000 * CAST(floor(weight / w_total * $budget) AS BIGINT)
       |           // n_docs AS threshold
       |  FROM mw, mt),
       |rel AS MATERIALIZED (
       |  SELECT t.doc_id, t.text_md5, t.n_tokens, t.lang
       |  FROM trainf t JOIN mix ON mix.lang IS NOT DISTINCT FROM t.lang
       |  WHERE CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)
       |             AS BIGINT) % 10000 < mix.threshold)
       |${funnel("1_exact", "base")}
       |UNION ALL ${funnel("2_quality", "qual")}
       |UNION ALL ${funnel("3_train", "trainf")}
       |UNION ALL ${funnel("4_mixture", "rel")}
       |UNION ALL
       |SELECT '5_shard' AS stage, CAST(doc_id % 16 AS INT) AS shard,
       |       count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |       $chk AS checksum
       |FROM rel GROUP BY 2
       |ORDER BY stage, shard""".stripMargin
  }
}
