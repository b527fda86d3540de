package graft.queries

import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.ops.Dedup

/** Dedup operators over `documents`, each mirrored by a DuckDB oracle that
  * reproduces the md5-derived integer hashing exactly (ops.Dedup scaladoc).
  */
object DedupQueries {

  private val P = Dedup.P

  /** DuckDB fragments mirroring Dedup's Spark expressions 1:1. */
  private def hbaseSql(n: Int, modP: Boolean): String = {
    val mod = if (modP) s" % $P" else ""
    s"""list_distinct(list_transform(range(0, len(string_split(text, ' ')) - $n + 1),
       |  i -> CAST('0x' || substr(md5(array_to_string(list_slice(string_split(text, ' '), i + 1, i + $n), ' ')), 1, 15) AS BIGINT)$mod))""".stripMargin
  }

  private def shCte(n: Int, src: String = "documents"): String =
    s"""sh AS (
       |  SELECT doc_id, ${hbaseSql(n, modP = true)} AS hbase
       |  FROM $src WHERE len(string_split(text, ' ')) >= $n)""".stripMargin

  /** Unrolled greedy max-coverage rounds: per round, gain = per-doc count
    * of postings not yet covered, argmax with (gain DESC, doc ASC)
    * tie-break, covered set grown by the winner's shingles (UNION dedups).
    */
  private lazy val greedyCoverageSql: String = {
    val rounds = 5
    val sb = new StringBuilder(
      s"WITH ${shCte(graft.ops.Dedup.defaultShingle)},\n" +
        "p AS (SELECT doc_id, unnest(hbase) AS h FROM sh)")
    for (r <- 1 to rounds) {
      val prev = r - 1
      val notCovered =
        if (prev == 0) ""
        else s"WHERE NOT EXISTS (SELECT 1 FROM c$prev c WHERE c.h = p.h)"
      val carry = if (prev == 0) "" else s"SELECT h FROM c$prev UNION "
      sb.append(s""",
         |g$r AS (SELECT doc_id, count(*) AS gain FROM p $notCovered GROUP BY doc_id),
         |b$r AS (SELECT doc_id, gain FROM g$r ORDER BY gain DESC, doc_id LIMIT 1),
         |c$r AS (${carry}SELECT DISTINCT h FROM p
         |        WHERE doc_id = (SELECT doc_id FROM b$r))""".stripMargin)
    }
    sb.append("\n" + (1 to rounds).map(r =>
      s"SELECT $r AS round, doc_id, gain, " +
        s"(SELECT count(*) FROM c$r) AS covered_total FROM b$r")
      .mkString("\nUNION ALL\n"))
    sb.append("\nORDER BY round")
    sb.toString
  }

  private val sigSql =
    s"""list_transform(range(0, ${Dedup.numHashes}),
       |  i -> list_min(list_transform(hbase,
       |    h -> ((1103515245 * (i + 1)) % $P * h + 12345 + 769 * i) % $P)))""".stripMargin

  /** Full mirror of Dedup.minhashLshPairs — shared by the pairs query and
    * the connected-components closure built on top of it.
    */
  /** Shared by dedup_components (direct) and dedup_components_incremental
    * (persisted labels + contracted star edges): the incremental
    * composition provably equals the full-batch closure, so one oracle
    * pins both — the merge-transparency convention.
    */
  private lazy val componentsOracleSql: String =
    s"""WITH RECURSIVE pairs AS (
         SELECT doc_a, doc_b FROM ($minhashPairsSql) t),
       edges AS (
         SELECT doc_a AS a, doc_b AS b FROM pairs
         UNION ALL
         SELECT doc_b AS a, doc_a AS b FROM pairs),
       reach(node, r) AS (
         SELECT DISTINCT a, a FROM edges
         UNION
         SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
       comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node)
      SELECT comp AS canonical_doc, count(*) AS n_docs
      FROM comp GROUP BY 1 ORDER BY 1"""

  private[queries] val minhashPairsSql: String =
    s"""WITH ${shCte(Dedup.defaultShingle)},
            sigs AS (SELECT doc_id, hbase, $sigSql AS sig FROM sh),
            bandrows AS (
              SELECT doc_id, b.band,
                     array_to_string(list_transform(
                       list_slice(sig, b.band * ${Dedup.rowsPerBand} + 1,
                                  b.band * ${Dedup.rowsPerBand} + ${Dedup.rowsPerBand}),
                       x -> CAST(x AS VARCHAR)), ',') AS band_key
              FROM sigs, (SELECT unnest(range(0, ${Dedup.bands})) AS band) b),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bandrows a JOIN bandrows b
                ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id)
        SELECT c.doc_a, c.doc_b,
              CAST(len(list_intersect(sa.hbase, sb.hbase)) AS DOUBLE)
                / (len(sa.hbase) + len(sb.hbase) - len(list_intersect(sa.hbase, sb.hbase))) AS jaccard
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE CAST(len(list_intersect(sa.hbase, sb.hbase)) AS DOUBLE)
                / (len(sa.hbase) + len(sb.hbase) - len(list_intersect(sa.hbase, sb.hbase))) >= 0.5
        ORDER BY doc_a, doc_b"""

  val all: Seq[GQuery] = Seq(

    GQuery("join_fuzzy_neighbors",
      (s, dir) => graft.ops.Dedup.editDistance1Neighbors(
          Tables.customer(s, dir), "c_custkey", "c_name")
        .orderBy(col("c_custkey")),
      Some("""WITH pairs AS (
                SELECT a.c_custkey AS ka, b.c_custkey AS kb
                FROM customer a JOIN customer b
                  ON a.c_custkey <> b.c_custkey
                 AND levenshtein(a.c_name, b.c_name) <= 1)
              SELECT c.c_custkey, count(p.kb) AS n_near, min(p.kb) AS nearest_key
              FROM customer c LEFT JOIN pairs p ON p.ka = c.c_custkey
              GROUP BY 1 ORDER BY 1"""),
      doc = "edit-distance-1 fuzzy neighbor census: FastSS deletion-neighborhood " +
        "blocking + exact levenshtein verify, proven complete by the quadratic oracle"),

    // ---- Entity resolution end-to-end: FastSS blocking → exact
    // edit-distance verify → connected components → entity census with
    // singleton fill — the record-linkage pipeline (one courier registered
    // twice with a typo'd name must settle to ONE payee). Composition of
    // the proven pieces: editDistance1Pairs (n·len blocking, never n²)
    // and the O(log n)-round star CC; singletons resolve to themselves
    // via one left join.
    GQuery("dedup_entity_resolution",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        // blocking key = nation prefix + name: ER's standard "compare only
        // within a block" — sequential synthetic names would otherwise
        // chain the whole table into one entity through the ED1 ladder
        // (names are unique, so a single edit can never bridge nations)
        val keyed = cust.select(col("c_custkey"),
          concat(col("c_nationkey").cast("string"), lit(":"), col("c_name"))
            .as("blocked_name"))
        // no lineage cut needed: connectedComponentsStar materializes its
        // pair input to parquet before iterating (its own round-0 cut)
        val pairs = Dedup.editDistance1Pairs(keyed, "c_custkey", "blocked_name")
          .select(col("ka").as("doc_a"), col("kb").as("doc_b"))
        // tiny-pair-set fast path lives INSIDE connectedComponentsStar:
        // a mostly-clean corpus verifies a bounded pair set, which the CC
        // entry point detects from its round-0 edge count (the pairs are
        // materialized to parquet exactly once) and solves with a driver
        // union-find instead of paying fixed multi-round iteration cost
        val comp = Dedup.connectedComponentsStar(pairs)
        cust.select(col("c_custkey").as("node"))
          .join(comp, Seq("node"), "left")
          .select(col("node"), coalesce(col("comp"), col("node")).as("entity_id"))
          .groupBy(col("entity_id"))
          .agg(count(lit(1)).as("n_members"), max(col("node")).as("max_member"))
          .orderBy(col("entity_id"))
      },
      Some("""WITH RECURSIVE pairs AS (
                SELECT a.c_custkey AS ka, b.c_custkey AS kb
                FROM customer a JOIN customer b
                  ON a.c_custkey < b.c_custkey
                 AND levenshtein(CAST(a.c_nationkey AS VARCHAR) || ':' || a.c_name,
                                 CAST(b.c_nationkey AS VARCHAR) || ':' || b.c_name) <= 1),
              edges AS (
                SELECT ka AS a, kb AS b FROM pairs
                UNION ALL
                SELECT kb AS a, ka AS b FROM pairs),
              reach(node, r) AS (
                SELECT DISTINCT a, a FROM edges
                UNION
                SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
              comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
              ent AS (
                SELECT c.c_custkey AS node,
                       COALESCE(comp.comp, c.c_custkey) AS entity_id
                FROM customer c LEFT JOIN comp ON comp.node = c.c_custkey)
              SELECT entity_id, count(*) AS n_members,
                     CAST(max(node) AS BIGINT) AS max_member
              FROM ent GROUP BY entity_id ORDER BY entity_id"""),
      doc = "entity resolution: FastSS ED1 blocking + exact verify + star CC + " +
        "singleton fill == recursive-closure oracle over quadratic levenshtein"),

    GQuery("dedup_exact",
      (s, dir) => Dedup.exactDuplicateGroups(Tables.documents(s, dir))
        .orderBy(col("text_md5")),
      Some("""SELECT md5(text) AS text_md5, min(doc_id) AS canonical_doc,
                     count(*) AS n_docs
              FROM documents GROUP BY 1 ORDER BY 1"""),
      doc = "exact dedup: hash-groupBy on raw text"),

    // ---- URL canonicalization dedup: the CommonCrawl-style curation
    // step that runs BEFORE any content hash — the same logical page
    // arrives under tracking-decorated, case-shifted, default-port and
    // fragment variants, and canonicalizing the URL collapses them
    // without reading a byte of body text. Variants are synthesized
    // deterministically from doc_id (host case via %3, :443 via %4,
    // utm_* tracking params via %2/%5, a REAL v=2 param via %5/%11 that
    // must SURVIVE, #fragment via %6); the canonicalizer is pure string
    // algebra (lowercase host, strip default port, drop utm_* params
    // keeping meaningful ones, strip fragment) — identical regex steps
    // on both engines. Per-row work only until the one hash-groupBy.
    GQuery("dedup_url_canonical",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("url", expr(
          """'https://' ||
            |CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END ||
            |'.example' ||
            |CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
            |'/doc/' || CAST(doc_id div 100 AS STRING) ||
            |CASE WHEN doc_id % 5 = 0 THEN '?v=2&utm_campaign=x'
            |     WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_id=' || CAST(doc_id AS STRING)
            |     WHEN doc_id % 11 = 0 THEN '?v=2'
            |     ELSE '' END ||
            |CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END""".stripMargin))
        .withColumn("kept", expr(
          """coalesce(array_join(filter(
            |  split(coalesce(regexp_extract(url, '\\?([^#]*)', 1), ''), '&'),
            |  p -> p NOT LIKE 'utm_%' AND p <> ''), '&'), '')""".stripMargin))
        .withColumn("canonical", expr(
          """'https://' || lower(regexp_extract(url, 'https://([^/:]+)', 1)) ||
            |regexp_extract(url, 'https://[^/]+(/[^#?]*)', 1) ||
            |CASE WHEN kept = '' THEN '' ELSE '?' || kept END""".stripMargin))
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("url")).as("n_raw_variants"),
          min(col("doc_id")).as("keeper_doc_id"))
        .orderBy(col("canonical")),
      Some("""WITH raw AS (
             |  SELECT doc_id,
             |         'https://' ||
             |         CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END ||
             |         '.example' ||
             |         CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
             |         '/doc/' || CAST(doc_id // 100 AS VARCHAR) ||
             |         CASE WHEN doc_id % 5 = 0 THEN '?v=2&utm_campaign=x'
             |              WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_id=' || CAST(doc_id AS VARCHAR)
             |              WHEN doc_id % 11 = 0 THEN '?v=2'
             |              ELSE '' END ||
             |         CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END AS url
             |  FROM documents),
             |canon AS (
             |  SELECT doc_id, url,
             |         'https://' || lower(regexp_extract(url, 'https://([^/:]+)', 1)) ||
             |         regexp_extract(url, 'https://[^/]+(/[^#?]*)', 1) ||
             |         CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canonical
             |  FROM (SELECT doc_id, url,
             |               COALESCE(array_to_string(list_filter(
             |                 string_split(COALESCE(regexp_extract(url, '\?([^#]*)', 1), ''), '&'),
             |                 p -> p NOT LIKE 'utm_%' AND p <> ''), '&'), '') AS kept
             |        FROM raw))
             |SELECT canonical, count(*) AS n_docs,
             |       count(DISTINCT url) AS n_raw_variants,
             |       min(doc_id) AS keeper_doc_id
             |FROM canon GROUP BY canonical ORDER BY canonical""".stripMargin),
      doc = "URL canonicalization dedup: lowercase host, strip :443 / " +
        "#fragment / utm_* tracking params (keeping meaningful params), " +
        "then one hash-groupBy census of the collapsed variant groups — " +
        "the pre-content-hash curation step"),

    GQuery("dedup_paragraphs",
      (s, dir) => Dedup.paragraphDedup(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                   e AS (SELECT doc_id, toks,
                                unnest(range(0, CAST(ceil(len(toks) / 4.0) AS BIGINT))) AS i
                         FROM t),
                   segs AS (SELECT doc_id, i AS seg_no,
                                   array_to_string(list_slice(toks, CAST(i * 4 + 1 AS INT),
                                                              CAST(i * 4 + 4 AS INT)), ' ') AS seg
                            FROM e),
                   bp AS (SELECT md5(seg) AS h FROM segs
                          GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
                   kept AS (SELECT * FROM segs WHERE md5(seg) NOT IN (SELECT h FROM bp)),
                   re AS (SELECT doc_id, count(*) AS n_kept,
                                 string_agg(seg, ' ' ORDER BY seg_no) AS clean
                          FROM kept GROUP BY doc_id)
              SELECT t.doc_id, CAST(ceil(len(t.toks) / 4.0) AS BIGINT) AS n_segs,
                     COALESCE(re.n_kept, 0) AS n_kept,
                     md5(COALESCE(re.clean, '')) AS clean_md5
              FROM t LEFT JOIN re ON t.doc_id = re.doc_id
              ORDER BY t.doc_id"""),
      doc = "C4/CCNet-style paragraph-level dedup: 4-token segments shared by >=2 " +
        "distinct docs are boilerplate, removed everywhere; cleaned text " +
        "reassembled in order and fingerprinted"),

    GQuery("dedup_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(minhashPairsSql),
      doc = "MinHash signature → LSH band join → exact-Jaccard verify (the 100 TB path)"),

    // ---- Source-overlap matrix: WHERE the near-duplication comes from —
    // the crawl-governance table (which vendors/hosts copy from each
    // other, which self-duplicate). Near-dup pairs joined to their docs'
    // sources, source pair canonicalized unordered (least/greatest);
    // diagonal = within-source duplication, off-diagonal = cross-source
    // contamination. |sources|²-bounded output over the banded pair set.
    GQuery("dedup_source_overlap",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val src = docs.select(col("doc_id"), col("source"))
        Dedup.minhashLshPairs(docs)
          .select(col("doc_a"), col("doc_b"))
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
          .select(least(col("sa"), col("sb")).as("source_a"),
            greatest(col("sa"), col("sb")).as("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some(s"""WITH prs AS (SELECT doc_a, doc_b FROM ($minhashPairsSql) t),
               j AS (
                 SELECT least(da.source, db.source) AS source_a,
                        greatest(da.source, db.source) AS source_b
                 FROM prs p
                 JOIN documents da ON da.doc_id = p.doc_a
                 JOIN documents db ON db.doc_id = p.doc_b)
               SELECT source_a, source_b, count(*) AS n_pairs
               FROM j GROUP BY 1, 2 ORDER BY 1, 2"""),
      doc = "near-dup source-overlap matrix: banded pairs attributed to " +
        "unordered source pairs — within-source vs cross-source duplication " +
        "census, the crawl-governance table"),

    GQuery("dedup_components",
      // the O(log n)-round large-star/small-star form — diameter-proof at
      // 100 TB; label propagation (Dedup.connectedComponents) shares the
      // contract and is spec-pinned equal (DedupSpec)
      (s, dir) => Dedup.connectedComponentsStar(
          Dedup.minhashLshPairs(Tables.documents(s, dir)).select(col("doc_a"), col("doc_b")))
        .groupBy(col("comp").as("canonical_doc"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("canonical_doc")),
      // the oracle computes the transitive closure with a recursive CTE —
      // per-node min reachable id == the propagation fixpoint
      Some(componentsOracleSql),
      doc = "near-dup cluster resolution: connected components over LSH pairs (large-star/small-star == recursive-CTE closure)"),

    // ---- INCREMENTAL near-dup clustering — the persisted-index lifecycle
    // (the sim_ivf_index_incremental convention) applied to components:
    // the historical (even-id) corpus is clustered once and its labels
    // persisted as a MergeTable; when the new (odd-id) batch arrives, CC
    // re-runs over ONLY the new batch's candidate pairs plus the old
    // clusters CONTRACTED to star edges (doc → persisted root) — the old
    // corpus participates as |old nodes| zero-width edges, never as
    // re-verified pairs. Correctness argument: band keys and Jaccard
    // verification are per-doc/per-pair pure functions, so
    // pairs(even) ∪ pairs(touching-odd) = pairs(all), and a cluster's
    // star closure equals its pair closure with the same min root —
    // hence the incremental result EQUALS the full-batch run and SHARES
    // dedup_components' oracle verbatim.
    GQuery("dedup_components_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val hist = docs.filter(col("doc_id") % 2 === 0)
        val labels = graft.stages.MergeTable.scratch(Seq("doc_id"))
        val oldComp = Dedup.connectedComponentsStar(
          Dedup.minhashLshPairs(hist).select(col("doc_a"), col("doc_b")))
        labels.replace(oldComp.select(col("node").as("doc_id"), col("comp")))
        val persisted = labels.read(s,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("comp",
              org.apache.spark.sql.types.LongType))))
        val starEdges = persisted.filter(col("doc_id") =!= col("comp"))
          .select(col("doc_id").as("doc_a"), col("comp").as("doc_b"))
        val newPairs = Dedup.minhashLshPairs(docs)
          .filter(col("doc_a") % 2 === 1 || col("doc_b") % 2 === 1)
          .select(col("doc_a"), col("doc_b"))
        Dedup.connectedComponentsStar(newPairs.unionByName(starEdges))
          .groupBy(col("comp").as("canonical_doc"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("canonical_doc"))
      },
      Some(componentsOracleSql),
      doc = "incremental near-dup clustering: persisted labels + new-batch " +
        "pairs + old clusters contracted to star edges == full-batch CC " +
        "(shared oracle)"),

    // ---- Golden-record survivorship — the MDM deliverable AFTER entity
    // resolution says "these rows are one customer": per multi-member
    // entity, one consolidated record by explicit survivorship rules
    // (name: longest-then-lexicographic-min via struct-min; balance: max;
    // nation/segment: min). Duplicate records are INJECTED
    // deterministically (every custkey ≡ 3 mod 100 re-registered with a
    // last-char-dropped name and a stale balance — the audit_merkle_diff
    // convention) so the ER fixture provably produces clusters at every
    // SF. Blocking + ED1 + star CC are the proven pieces; the merge is
    // one groupBy over cluster labels.
    GQuery("dedup_golden_record",
      (s, dir) => {
        val cust = Tables.customer(s, dir).select(col("c_custkey"),
          col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
        val typos = cust.filter(col("c_custkey") % 100 === 3)
          .select((col("c_custkey") + 10000000L).as("c_custkey"),
            expr("substring(c_name, 1, length(c_name) - 1)").as("c_name"),
            col("c_nationkey"), (col("c_acctbal") - 1).as("c_acctbal"),
            col("c_mktsegment"))
        val all = cust.unionByName(typos)
        val keyed = all.select(col("c_custkey"),
          concat(col("c_nationkey").cast("string"), lit(":"), col("c_name"))
            .as("blocked_name"))
        val pairs = Dedup.editDistance1Pairs(keyed, "c_custkey", "blocked_name")
          .select(col("ka").as("doc_a"), col("kb").as("doc_b"))
        val comp = Dedup.connectedComponentsStar(pairs)
        all.join(comp, all("c_custkey") === comp("node"), "left")
          .withColumn("entity_id", coalesce(col("comp"), col("c_custkey")))
          .groupBy(col("entity_id"))
          .agg(count(lit(1)).as("n_members"),
            min(struct((-length(col("c_name"))).as("l"), col("c_name").as("n")))
              .as("best"),
            max(col("c_acctbal")).as("acctbal"),
            min(col("c_nationkey")).as("nation"),
            min(col("c_mktsegment")).as("segment"))
          .filter(col("n_members") > 1)
          .select(col("entity_id"), col("n_members"),
            col("best.n").as("golden_name"), col("acctbal"),
            col("nation"), col("segment"))
          .orderBy(col("entity_id"))
      },
      Some("""WITH RECURSIVE cust AS (
                SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
                FROM customer),
              typos AS (
                SELECT c_custkey + 10000000 AS c_custkey,
                       substr(c_name, 1, length(c_name) - 1) AS c_name,
                       c_nationkey, c_acctbal - 1 AS c_acctbal, c_mktsegment
                FROM cust WHERE c_custkey % 100 = 3),
              a AS (SELECT * FROM cust UNION ALL SELECT * FROM typos),
              pairs AS (
                SELECT x.c_custkey AS ka, y.c_custkey AS kb
                FROM a x JOIN a y
                  ON x.c_custkey < y.c_custkey
                 AND levenshtein(CAST(x.c_nationkey AS VARCHAR) || ':' || x.c_name,
                                 CAST(y.c_nationkey AS VARCHAR) || ':' || y.c_name) <= 1),
              edges AS (
                SELECT ka AS u, kb AS v FROM pairs
                UNION ALL SELECT kb AS u, ka AS v FROM pairs),
              reach(node, r) AS (
                SELECT DISTINCT u, u FROM edges
                UNION
                SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v),
              comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
              ent AS (
                SELECT a.*, COALESCE(comp.comp, a.c_custkey) AS entity_id
                FROM a LEFT JOIN comp ON comp.node = a.c_custkey)
              SELECT entity_id, count(*) AS n_members,
                     min({'l': -length(c_name), 'n': c_name}).n AS golden_name,
                     max(c_acctbal) AS acctbal,
                     min(c_nationkey) AS nation,
                     min(c_mktsegment) AS segment
              FROM ent GROUP BY entity_id HAVING count(*) > 1
              ORDER BY entity_id"""),
      doc = "golden-record survivorship after ER: injected typo duplicates " +
        "resolved to clusters, merged by explicit rules (longest-then-min " +
        "name, max balance, min nation/segment)"),

    // ---- Dedup-aware effective token budget: after the cluster census
    // says which docs are copies, what does each source REALLY contribute
    // to training? Every doc's tokens are down-weighted by its cluster
    // size (tokens·100 div csize — deterministic truncation both
    // engines), so a 5-copy cluster counts once. The raw-vs-effective gap
    // per source is the mixture-weight correction input.
    GQuery("dedup_effective_tokens",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val comp = Dedup.connectedComponentsStar(
          Dedup.minhashLshPairs(docs).select(col("doc_a"), col("doc_b")))
        val sized = comp.groupBy(col("comp")).agg(count(lit(1)).as("csize"))
        docs.join(comp, docs("doc_id") === comp("node"), "left")
          .withColumn("cluster", coalesce(col("comp"), col("doc_id")))
          .join(sized.select(col("comp").as("cluster"), col("csize")),
            Seq("cluster"), "left")
          .withColumn("csize", coalesce(col("csize"), lit(1L)))
          .withColumn("toks", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).as("raw_tokens"),
            sum(expr("toks * 100 div csize")).as("effective_tokens_e2"),
            count(when(col("csize") > 1, lit(1))).as("n_in_clusters"))
          .orderBy(col("source"))
      },
      Some(s"""WITH RECURSIVE pairs AS (
                 SELECT doc_a, doc_b FROM ($minhashPairsSql) t),
               edges AS (
                 SELECT doc_a AS u, doc_b AS v FROM pairs
                 UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
               reach(node, r) AS (
                 SELECT DISTINCT u, u FROM edges
                 UNION
                 SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v),
               comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
               lbl AS (
                 SELECT d.doc_id, d.source, COALESCE(c.comp, d.doc_id) AS cluster,
                        CAST(len(string_split(d.text, ' ')) AS BIGINT) AS toks
                 FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
               sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS csize
                      FROM lbl GROUP BY cluster)
               SELECT l.source, count(*) AS n_docs,
                      CAST(SUM(l.toks) AS BIGINT) AS raw_tokens,
                      CAST(SUM(l.toks * 100 // s.csize) AS BIGINT) AS effective_tokens_e2,
                      CAST(count(*) FILTER (s.csize > 1) AS BIGINT) AS n_in_clusters
               FROM lbl l JOIN sz s USING (cluster)
               GROUP BY l.source ORDER BY l.source"""),
      doc = "dedup-aware effective tokens per source: cluster-size " +
        "down-weighting (tokens*100 div csize), raw-vs-effective mixture input"),

    // ---- Near-dup-aware train/test split — the leakage split_train_val
    // cannot prevent: hashing DOCS sends near-copies of training docs
    // into test (inflated eval). Hashing the CLUSTER id instead keeps
    // every near-dup family on one side BY CONSTRUCTION. The census
    // proves it: per method the split sizes plus the count of near-dup
    // pairs CROSSING the split — nonzero for by_doc, structurally zero
    // for by_cluster. The eval-integrity sibling of decontamination.
    GQuery("dedup_aware_split",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // one LSH pass, one lineage cut: `pairs` feeds BOTH the component
        // labelling and the two cross-split censuses, and `assigned` is
        // referenced six times below — uncut, the plan replayed the whole
        // minhash derivation per reference (measured 14 base scans)
        val pairs = Dedup.minhashLshPairs(docs)
          .select(col("doc_a"), col("doc_b"))
          .localCheckpoint(true)
        val comp = Dedup.connectedComponentsStar(pairs)
        val lbl = docs.select(col("doc_id"))
          .join(comp, docs("doc_id") === comp("node"), "left")
          .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster"))
        def bucket(c: org.apache.spark.sql.Column) =
          when(expr(s"CAST(conv(substring(md5(CAST(${c} AS STRING)), 1, 4), 16, 10) AS BIGINT) % 100") < 10,
            lit("test")).otherwise(lit("train"))
        // narrow 4-col corpus-keyed table — the survivor-table checkpoint
        // convention (ids + enums only, no text payload)
        val assigned = lbl
          .withColumn("by_doc", bucket(col("doc_id")))
          .withColumn("by_cluster", bucket(col("cluster")))
          .localCheckpoint(true)
        def census(method: String) = {
          val sizes = assigned.groupBy(col(method).as("split"))
            .agg(count(lit(1)).as("n_docs"))
          val cross = pairs
            .join(assigned.select(col("doc_id").as("doc_a"),
              col(method).as("sa")), Seq("doc_a"))
            .join(assigned.select(col("doc_id").as("doc_b"),
              col(method).as("sb")), Seq("doc_b"))
            .agg(count(when(col("sa") =!= col("sb"), lit(1))).as("n_cross_pairs"))
          sizes.crossJoin(broadcast(cross))
            .select(lit(method).as("method"), col("split"),
              col("n_docs"), col("n_cross_pairs"))
        }
        census("by_doc").unionByName(census("by_cluster"))
          .orderBy(col("method"), col("split"))
      },
      Some(s"""WITH RECURSIVE pairs AS (
                 SELECT doc_a, doc_b FROM ($minhashPairsSql) t),
               edges AS (
                 SELECT doc_a AS u, doc_b AS v FROM pairs
                 UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
               reach(node, r) AS (
                 SELECT DISTINCT u, u FROM edges
                 UNION
                 SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v),
               comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
               lbl AS (
                 SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster
                 FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
               assigned AS (
                 SELECT doc_id, cluster,
                        CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 10
                             THEN 'test' ELSE 'train' END AS by_doc,
                        CASE WHEN CAST('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 10
                             THEN 'test' ELSE 'train' END AS by_cluster
                 FROM lbl),
               cx AS (
                 SELECT
                   CAST(count(*) FILTER (a.by_doc <> b.by_doc) AS BIGINT) AS cross_doc,
                   CAST(count(*) FILTER (a.by_cluster <> b.by_cluster) AS BIGINT) AS cross_cluster
                 FROM pairs p
                 JOIN assigned a ON a.doc_id = p.doc_a
                 JOIN assigned b ON b.doc_id = p.doc_b)
               SELECT method, split, n_docs, n_cross_pairs FROM (
                 SELECT 'by_doc' AS method, by_doc AS split, count(*) AS n_docs,
                        (SELECT cross_doc FROM cx) AS n_cross_pairs
                 FROM assigned GROUP BY by_doc
                 UNION ALL
                 SELECT 'by_cluster', by_cluster, count(*),
                        (SELECT cross_cluster FROM cx)
                 FROM assigned GROUP BY by_cluster)
               ORDER BY method, split"""),
      doc = "near-dup-aware train/test split: cluster-hash assignment keeps " +
        "every near-dup family on one side (cross-pairs structurally 0) vs " +
        "doc-hash's measured leakage — the eval-integrity gate"),

    // ---- The KEEP decision a dedup pass actually ships: per near-dup
    // cluster, the surviving copy chosen by QUALITY (is_quality, then
    // token count, then id as the deterministic tie-break) — the
    // keep-best-not-keep-first policy real curation uses (min-id canonical
    // keeps whatever crawled first; this keeps the best copy). One rank
    // window per cluster over the component labels joined to per-doc
    // features; clusters are tiny by construction, the window partitioning
    // is by cluster — no global window anywhere.
    GQuery("dedup_canonical_best",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val comp = Dedup.connectedComponentsStar(
          Dedup.minhashLshPairs(docs).select(col("doc_a"), col("doc_b")))
        val feats = graft.ops.TextAnalysis.qualityScore(docs)
          .select(col("doc_id"), col("is_quality"), col("n_tokens"))
        comp.join(feats, comp("node") === feats("doc_id"))
          .withColumn("rk", row_number().over(Window.partitionBy(col("comp"))
            .orderBy(col("is_quality").desc, col("n_tokens").desc, col("node").asc)))
          .groupBy(col("comp").as("cluster"))
          .agg(max(when(col("rk") === 1, col("node"))).as("keep_doc"),
            count(lit(1)).as("n_docs"),
            count(when(col("is_quality"), 1)).as("n_quality"))
          .orderBy(col("cluster"))
      },
      Some(s"""WITH RECURSIVE pairs AS (
                 SELECT doc_a, doc_b FROM ($minhashPairsSql) t),
               edges AS (
                 SELECT doc_a AS a, doc_b AS b FROM pairs
                 UNION ALL
                 SELECT doc_b AS a, doc_a AS b FROM pairs),
               reach(node, r) AS (
                 SELECT DISTINCT a, a FROM edges
                 UNION
                 SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
               comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
               feat AS (
                 SELECT doc_id,
                        (len(string_split(text, ' ')) >= 20
                         AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                             / len(string_split(text, ' ')) >= 0.3
                         AND CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                             / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0) AS is_quality,
                        len(string_split(text, ' ')) AS n_tokens
                 FROM documents),
               ranked AS (
                 SELECT c.comp, c.node, f.is_quality,
                        row_number() OVER (PARTITION BY c.comp
                          ORDER BY f.is_quality DESC, f.n_tokens DESC, c.node ASC) AS rk
                 FROM comp c JOIN feat f ON f.doc_id = c.node)
              SELECT comp AS cluster,
                     MAX(CASE WHEN rk = 1 THEN node END) AS keep_doc,
                     count(*) AS n_docs,
                     count(*) FILTER (WHERE is_quality) AS n_quality
              FROM ranked GROUP BY comp ORDER BY cluster"""),
      doc = "quality-aware canonical selection per near-dup cluster " +
        "(keep the BEST copy, not the first-crawled one)"),

    // ---- LSH estimator calibration: on the banding's real candidate
    // pairs, estimated (signature-agreement) vs exact Jaccard thresholded
    // at a tau ladder — the tuning table for tau / band geometry, with
    // the estimator's precision/recall visible per threshold.
    GQuery("dedup_threshold_sweep",
      (s, dir) => Dedup.lshCalibrationSweep(Tables.documents(s, dir))
        .orderBy(col("tau")),
      Some(s"""WITH ${shCte(Dedup.defaultShingle)},
               sigs AS (SELECT doc_id, hbase, $sigSql AS sig FROM sh),
               bandrows AS (
                 SELECT doc_id, b.band,
                        array_to_string(list_transform(
                          list_slice(sig, b.band * ${Dedup.rowsPerBand} + 1,
                                     b.band * ${Dedup.rowsPerBand} + ${Dedup.rowsPerBand}),
                          x -> CAST(x AS VARCHAR)), ',') AS band_key
                 FROM sigs, (SELECT unnest(range(0, ${Dedup.bands})) AS band) b),
               cand AS (
                 SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bandrows a JOIN bandrows b
                   ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id),
               scored AS (
                 SELECT CAST(len(list_filter(range(1, ${Dedup.numHashes} + 1),
                               i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)]))
                             AS DOUBLE) / ${Dedup.numHashes} AS est,
                        CAST(len(list_intersect(sa.hbase, sb.hbase)) AS DOUBLE)
                          / (len(sa.hbase) + len(sb.hbase)
                             - len(list_intersect(sa.hbase, sb.hbase))) AS exact
                 FROM cand c
                 JOIN sigs sa ON sa.doc_id = c.doc_a
                 JOIN sigs sb ON sb.doc_id = c.doc_b)
              SELECT t.tau,
                     count(*) AS n_candidates,
                     count(*) FILTER (WHERE est >= t.tau) AS n_est_pass,
                     count(*) FILTER (WHERE exact >= t.tau) AS n_exact_pass,
                     count(*) FILTER (WHERE est >= t.tau AND exact >= t.tau) AS n_agree
              FROM scored, (VALUES (0.5), (0.6), (0.7), (0.8), (0.9)) t(tau)
              GROUP BY t.tau ORDER BY t.tau"""),
      doc = "LSH calibration sweep: estimated vs exact Jaccard across a tau " +
        "ladder on the banding's candidate pairs"),

    GQuery("dedup_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(Tables.documents(s, dir))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH ${shCte(5)},
                   posting AS (SELECT doc_id, unnest(hbase) AS h FROM sh),
                   inter AS (
                     SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
                     FROM posting a JOIN posting b ON a.h = b.h AND a.doc_id < b.doc_id
                     GROUP BY 1, 2),
                   sizes AS (SELECT doc_id, len(hbase) AS n_sh FROM sh)
              SELECT i.doc_a, i.doc_b,
                     CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.5
              ORDER BY doc_a, doc_b"""),
      doc = "exact 5-gram Jaccard via inverted shingle index (bounded-df path)"),

    // ---- Greedy maximum-coverage selection (coreset / facility-location
    // family, Nemhauser 1−1/e guarantee): k docs maximizing distinct
    // shingles covered, marginal gain per round. The oracle unrolls the
    // k rounds as a CTE chain (gain table → argmax → covered-set union).
    GQuery("prep_greedy_coverage",
      (s, dir) => graft.ops.TrainPrep.greedyCoverage(
          Tables.documents(s, dir), k = 5)
        .orderBy(col("round")),
      Some(greedyCoverageSql),
      doc = "greedy max-coverage data selection: 5 rounds of anti-join gain " +
        "census + deterministic argmax == unrolled-rounds oracle"),

    // ---- Asymmetric containment |A∩B|/|A| ≥ 0.8 as DIRECTED pairs: the
    // doc-in-doc / quotation case symmetric Jaccard structurally misses
    // (a fully-embedded small doc scores J≈0.04 but C=1.0). Same exact
    // inverted shingle index, one divide per candidate.
    GQuery("dedup_containment",
      (s, dir) => Dedup.ngramContainmentPairs(Tables.documents(s, dir))
        .orderBy(col("doc_small"), col("doc_big")),
      Some(s"""WITH ${shCte(5)},
                   posting AS (SELECT doc_id, unnest(hbase) AS h FROM sh),
                   inter AS (
                     SELECT a.doc_id AS doc_small, b.doc_id AS doc_big,
                            count(*) AS n_inter
                     FROM posting a JOIN posting b
                       ON a.h = b.h AND a.doc_id <> b.doc_id
                     GROUP BY 1, 2),
                   sizes AS (SELECT doc_id, len(hbase) AS n_sh FROM sh)
              SELECT i.doc_small, i.doc_big, i.n_inter,
                     CAST(s.n_sh AS INT) AS n_sh,
                     CAST(i.n_inter AS DOUBLE) / s.n_sh AS containment
              FROM inter i JOIN sizes s ON s.doc_id = i.doc_small
              WHERE CAST(i.n_inter AS DOUBLE) / s.n_sh >= 0.8
              ORDER BY doc_small, doc_big"""),
      doc = "directed shingle containment (doc-in-doc dedup signal) over the " +
        "exact inverted index == quadratic oracle"),

    GQuery("dedup_simhash",
      (s, dir) => Dedup.simhashPairs(Tables.documents(s, dir))
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH sh AS (
                     SELECT doc_id, ${hbaseSql(Dedup.defaultShingle, modP = false)} AS h60
                     FROM documents WHERE len(string_split(text, ' ')) >= ${Dedup.defaultShingle}),
                   sim AS (
                     SELECT doc_id, CAST(list_sum(list_transform(range(0, 60),
                       j -> CASE WHEN 2 * len(list_filter(h60, h -> ((h >> j) & 1) = 1)) >= len(h60)
                                 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
                     FROM sh),
                   chunks AS (
                     SELECT doc_id, simhash, c.c, (simhash >> (c.c * 15)) & 32767 AS chunk
                     FROM sim, (SELECT unnest(range(0, 4)) AS c) c),
                   cand AS (
                     SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
                                     b.doc_id AS doc_b, b.simhash AS sim_b
                     FROM chunks a JOIN chunks b
                       ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
              SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
              FROM cand
              WHERE bit_count(xor(sim_a, sim_b)) <= 6
              ORDER BY doc_a, doc_b"""),
      doc = "60-bit SimHash, 4×15-bit band join, Hamming ≤ 6"),

    // ---- end-to-end curation: the composed pipeline (exact dedup →
    // MinHash-LSH near-dup removal → quality gate → language census).
    GQuery("curate_corpus",
      (s, dir) => graft.ops.Curate.curateCorpus(Tables.documents(s, dir))
        .orderBy(col("labeled_lang"), col("predicted_lang")),
      Some(curateSql),
      doc = "end-to-end corpus curation census per language (every stage oracle-mirrored)"),

    // The 100 TB shape of curate_corpus, driven end-to-end: the corpus
    // arrives as two incremental batches; each run scans only its batch's
    // text and answers the table side from the persisted band-key INDEX
    // (batch-vs-index, Curate.curateCorpusIncremental), and the converged
    // survivor census must equal the single-shot recompute — which is
    // exactly the curate_corpus oracle, shared verbatim.
    //
    // Cost adjudication (r12 isolation run, REPS=3): warm min ≈ 6.6 s =
    // TWO full incremental commit cycles at ~3.3 s each (index feature
    // build + batch-vs-index candidates + two table commits + census per
    // cycle) — at parity with the lake-DML commit-cycle family; the
    // historical spread (~8 s on rep 1) is first-execution JIT of the
    // curation lineage, not a strippable fixed cost.
    GQuery("curate_corpus_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val table = graft.stages.MergeTable.scratch(Seq("doc_id"))
        val index = graft.stages.MergeTable.scratch(Seq("doc_id"))
        graft.ops.Curate.curateCorpusIncremental(
          docs.filter(col("doc_id") % 2 === 0), table, index)
        graft.ops.Curate.curateCorpusIncremental(
          docs.filter(col("doc_id") % 2 === 1), table, index)
          .orderBy(col("labeled_lang"), col("predicted_lang"))
      },
      Some(curateSql),
      doc = "batch-vs-index incremental curation converges to the recompute census (shared oracle)"),

    GQuery("curate_domain_cap",
      (s, dir) => graft.ops.Curate.domainCapCensus(Tables.documents(s, dir), cap = 50)
        .orderBy(col("source")),
      Some("""WITH r AS (
                SELECT source, doc_id, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY n_chars DESC, doc_id) AS r
                FROM documents)
              SELECT source, count(*) AS n_docs,
                     CAST(count(CASE WHEN r <= 50 THEN 1 END) AS BIGINT) AS n_kept,
                     CAST(SUM(CASE WHEN r <= 50 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
                     max(CASE WHEN r <= 50 THEN n_chars END) AS max_kept_chars,
                     min(CASE WHEN r <= 50 THEN n_chars END) AS min_kept_chars
              FROM r GROUP BY source ORDER BY source"""),
      doc = "C4-style per-source domain cap: top-50 docs per source by length " +
        "with the per-source census of what the cap cost"),

    // The single-pass TopKAggregator form of the same cap — the
    // hot-domain scale ladder, proven value-identical by sharing the
    // window form's oracle (the sim_topk_brute_agg pattern).
    GQuery("curate_domain_cap_agg",
      (s, dir) => graft.ops.Curate.domainCapCensusAgg(Tables.documents(s, dir), cap = 50)
        .orderBy(col("source")),
      Some("""WITH r AS (
                SELECT source, doc_id, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY n_chars DESC, doc_id) AS r
                FROM documents)
              SELECT source, count(*) AS n_docs,
                     CAST(count(CASE WHEN r <= 50 THEN 1 END) AS BIGINT) AS n_kept,
                     CAST(SUM(CASE WHEN r <= 50 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
                     max(CASE WHEN r <= 50 THEN n_chars END) AS max_kept_chars,
                     min(CASE WHEN r <= 50 THEN n_chars END) AS min_kept_chars
              FROM r GROUP BY source ORDER BY source"""),
      doc = "bounded-buffer (TopKAggregator) domain cap == window form (shared oracle)"),

    // ---- Prefix-filtered set-similarity join (AllPairs/PPJoin): shingle
    // Jaccard >= 3/5 with only rarest-first PREFIXES indexed plus the
    // length filter — the boilerplate df^2 blowup of a full inverted
    // index never enters the join, and the prefix lemma guarantees zero
    // false negatives (the property DedupSpec proves against brute
    // force; the oracle mirrors the same prefix mechanics element for
    // element, pinning rank order, ceiling arithmetic, the length bound,
    // and the exact verify cross-engine).
    GQuery("dedup_prefix_filter",
      (s, dir) => Dedup.prefixFilterPairs(Tables.documents(s, dir))
        .orderBy(col("id1"), col("id2")),
      Some(s"""WITH ${shCte(Dedup.defaultShingle)},
              toks AS (
                SELECT doc_id, len(hbase) AS sz, unnest(hbase) AS h FROM sh),
              dft AS (SELECT h, count(*) AS df FROM toks GROUP BY h),
              ranked AS (
                SELECT t.doc_id, t.h, t.sz,
                       ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                          ORDER BY d.df, t.h) AS rn
                FROM toks t JOIN dft d USING (h)),
              pre AS (
                SELECT doc_id, sz, h FROM ranked
                WHERE rn <= sz - ((3 * sz + 4) // 5) + 1),
              cand AS (
                SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                FROM pre a JOIN pre b
                  ON a.h = b.h AND a.doc_id < b.doc_id
                 AND a.sz * 3 <= b.sz * 5 AND b.sz * 3 <= a.sz * 5),
              ver AS (
                SELECT id1, id2,
                       len(list_intersect(x.hbase, y.hbase)) AS inter_sz,
                       len(x.hbase) + len(y.hbase)
                         - len(list_intersect(x.hbase, y.hbase)) AS union_sz
                FROM cand
                JOIN sh x ON x.doc_id = cand.id1
                JOIN sh y ON y.doc_id = cand.id2)
              SELECT id1, id2,
                     CAST(inter_sz AS INT) AS inter_sz,
                     CAST(union_sz AS INT) AS union_sz,
                     CAST(inter_sz AS DOUBLE) / union_sz AS jaccard
              FROM ver WHERE inter_sz * 5 >= union_sz * 3
              ORDER BY id1, id2"""),
      doc = "prefix-filtered set-similarity join (AllPairs/PPJoin): rarest-first " +
        "prefix index + length filter, integer-exact ceiling, exact intersect " +
        "verify — no df cap, no false negatives")
  )

  /** DuckDB mirror of Curate.curateCorpus: each stage reuses the exact SQL
    * fragment its standalone query is checked with.
    */
  private def curateSql: String = {
    val toks = "string_split(text, ' ')"
    def scoreSql(lang: String): String = {
      val words = graft.ops.TextAnalysis.stopwords.toMap.apply(lang)
        .map(w => s"t = '$w'").mkString(" OR ")
      s"(CAST(len(list_filter($toks, t -> $words)) AS DOUBLE) / len($toks))"
    }
    val scores = Seq("en", "de", "es", "fr", "zh")
      .map(l => s"${scoreSql(l)} AS score_$l").mkString(",\n         ")
    s"""WITH canon AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |docs0 AS (
       |  SELECT d.* FROM documents d JOIN canon c ON d.doc_id = c.doc_id),
       |${shCte(Dedup.defaultShingle, "docs0")},
       |sigs AS (SELECT doc_id, hbase, $sigSql AS sig FROM sh),
       |bandrows AS (
       |  SELECT doc_id, b.band,
       |         array_to_string(list_transform(
       |           list_slice(sig, b.band * ${Dedup.rowsPerBand} + 1,
       |                      b.band * ${Dedup.rowsPerBand} + ${Dedup.rowsPerBand}),
       |           x -> CAST(x AS VARCHAR)), ',') AS band_key
       |  FROM sigs, (SELECT unnest(range(0, ${Dedup.bands})) AS band) b),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bandrows a JOIN bandrows b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id),
       |losers AS (
       |  SELECT DISTINCT c.doc_b AS doc_id
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b
       |  WHERE CAST(len(list_intersect(sa.hbase, sb.hbase)) AS DOUBLE)
       |          / (len(sa.hbase) + len(sb.hbase) - len(list_intersect(sa.hbase, sb.hbase))) >= 0.5),
       |surv AS (
       |  SELECT d.* FROM docs0 d LEFT JOIN losers l ON d.doc_id = l.doc_id
       |  WHERE l.doc_id IS NULL),
       |feat AS (
       |  SELECT doc_id, lang AS labeled_lang,
       |         len($toks) AS n_tokens,
       |         CAST(len(list_distinct($toks)) AS DOUBLE) / len($toks) AS ttr,
       |         CAST(length(text) - len($toks) + 1 AS DOUBLE) / len($toks) AS mtl,
       |         $scores
       |  FROM surv),
       |q AS (
       |  SELECT * FROM feat
       |  WHERE n_tokens >= 20 AND ttr >= 0.3 AND mtl >= 2.0 AND mtl <= 12.0),
       |labeled AS (
       |  SELECT labeled_lang, n_tokens,
       |         CASE WHEN score_zh > score_en AND score_zh > score_de AND score_zh > score_es AND score_zh > score_fr THEN 'zh'
       |              WHEN score_fr > score_en AND score_fr > score_de AND score_fr > score_es AND score_fr >= score_zh THEN 'fr'
       |              WHEN score_es > score_en AND score_es > score_de AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
       |              WHEN score_de > score_en AND score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
       |              ELSE 'en' END AS predicted_lang
       |  FROM q)
       |SELECT labeled_lang, predicted_lang, count(*) AS n_docs,
       |       -- CAST: DuckDB integer SUM returns HUGEINT, whose rendering is
       |       -- version-dependent (see split_train_val oracle note)
       |       CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
       |FROM labeled GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
