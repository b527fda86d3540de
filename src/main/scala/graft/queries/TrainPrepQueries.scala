package graft.queries

import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.ops.TrainPrep

/** Training-set preparation operators (stratified sampling, sequence
  * packing, benchmark decontamination) with DuckDB oracles. Numeric
  * contract as everywhere: md5-derived buckets/hashes + integer counts,
  * one final double division.
  */
object TrainPrepQueries {

  /** Mirror of Dedup.withShingleHashes' hashing (same fragment as
    * DedupQueries: first 15 md5 hex chars as a 60-bit integer mod P).
    */
  private val hbaseSql =
    s"""list_distinct(list_transform(range(0, len(string_split(text, ' ')) - 3 + 1),
       |  i -> CAST('0x' || substr(md5(array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' ')), 1, 15) AS BIGINT) % ${graft.ops.Dedup.P}))""".stripMargin

  private val mixRates = Map("en" -> 20, "de" -> 50, "zh" -> 100)

  val all: Seq[GQuery] = Seq(

    // ---- Dedup-aware temperature mixture: budget languages by UNIQUE
    // content, not raw volume — mixture weights from cluster-size
    // down-weighted effective tokens (dedup_effective_tokens' kernel) side
    // by side with the raw-token budgets, so the readout shows exactly how
    // much budget each language's duplication was stealing. Weight totals
    // fold in sorted-lang order (float addition is order-sensitive — the
    // temperatureMixture convention); lang is nullable, every join is
    // null-safe.
    GQuery("prep_mix_effective_tokens",
      (s, dir) => {
        import graft.ops.Dedup
        val docs = Tables.documents(s, dir)
        val comp = Dedup.connectedComponentsStar(
          Dedup.minhashLshPairs(docs).select(col("doc_a"), col("doc_b")))
        val sized = comp.groupBy(col("comp")).agg(count(lit(1)).as("csize"))
        val eff = docs.join(comp, docs("doc_id") === comp("node"), "left")
          .withColumn("cluster", coalesce(col("comp"), col("doc_id")))
          .join(sized.select(col("comp").as("cluster"), col("csize")),
            Seq("cluster"), "left")
          .withColumn("csize", coalesce(col("csize"), lit(1L)))
          .withColumn("toks", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).as("raw_tokens"),
            sum(expr("toks * 100 div csize")).as("eff_tokens_e2"))
          .localCheckpoint(true) // |langs| rows, referenced by both folds
        def budgets(wcol: String, alias: String) = {
          val w = eff.select(col("lang").as("_l"),
            sqrt(col(wcol).cast("double")).as("weight"))
          val tot = w.agg(expr(
            """aggregate(transform(sort_array(collect_list(struct(_l, weight))),
              |  x -> x.weight), 0D, (acc, v) -> acc + v)""".stripMargin).as("w_total"))
          w.crossJoin(broadcast(tot))
            .select(col("_l"),
              floor(col("weight") / col("w_total") * 300).cast("long").as(alias))
        }
        val br = budgets("raw_tokens", "budget_by_raw")
        val be = budgets("eff_tokens_e2", "budget_by_eff")
        eff.join(br, col("lang") <=> br("_l")).drop("_l")
          .join(be, col("lang") <=> be("_l")).drop("_l")
          .orderBy(col("lang").asc_nulls_first)
      },
      Some(s"""WITH RECURSIVE pairs AS (
              |  SELECT doc_a, doc_b FROM (${DedupQueries.minhashPairsSql}) t),
              |edges AS (
              |  SELECT doc_a AS u, doc_b AS v FROM pairs
              |  UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
              |reach(node, r) AS (
              |  SELECT DISTINCT u, u FROM edges
              |  UNION
              |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v),
              |comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
              |lbl AS (
              |  SELECT d.doc_id, d.lang, COALESCE(c.comp, d.doc_id) AS cluster,
              |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS toks
              |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
              |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS csize
              |       FROM lbl GROUP BY cluster),
              |eff AS MATERIALIZED (
              |  SELECT l.lang, count(*) AS n_docs,
              |         CAST(SUM(l.toks) AS BIGINT) AS raw_tokens,
              |         CAST(SUM(l.toks * 100 // s.csize) AS BIGINT) AS eff_tokens_e2
              |  FROM lbl l JOIN sz s USING (cluster)
              |  GROUP BY l.lang),
              |wr AS (SELECT lang, sqrt(CAST(raw_tokens AS DOUBLE)) AS w FROM eff),
              |twr AS (SELECT list_sum(list(w ORDER BY lang NULLS FIRST)) AS t FROM wr),
              |br AS (SELECT lang, CAST(floor(w / t * 300) AS BIGINT) AS budget_by_raw
              |       FROM wr, twr),
              |we AS (SELECT lang, sqrt(CAST(eff_tokens_e2 AS DOUBLE)) AS w FROM eff),
              |twe AS (SELECT list_sum(list(w ORDER BY lang NULLS FIRST)) AS t FROM we),
              |be AS (SELECT lang, CAST(floor(w / t * 300) AS BIGINT) AS budget_by_eff
              |       FROM we, twe)
              |SELECT e.lang, e.n_docs, e.raw_tokens, e.eff_tokens_e2,
              |       br.budget_by_raw, be.budget_by_eff
              |FROM eff e
              |JOIN br ON br.lang IS NOT DISTINCT FROM e.lang
              |JOIN be ON be.lang IS NOT DISTINCT FROM e.lang
              |ORDER BY e.lang NULLS FIRST""".stripMargin),
      doc = "dedup-aware temperature mixture: sqrt-weights over cluster-size " +
        "down-weighted effective tokens vs raw tokens, per-language budget " +
        "shift readout (sorted-order float folds, null-safe lang joins)"),

    GQuery("prep_mix_temperature",
      (s, dir) => TrainPrep.temperatureMixture(Tables.documents(s, dir), budget = 100000L)
        .orderBy(col("lang")),
      Some("""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
                   w AS (SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS weight FROM c),
                   t AS (SELECT list_sum(list(weight ORDER BY lang NULLS FIRST)) AS w_total FROM w)
              SELECT lang, n_docs, weight, weight / w_total AS share,
                     CAST(floor(weight / w_total * 100000) AS BIGINT) AS n_budgeted
              FROM w, t ORDER BY lang NULLS FIRST"""),
      doc = "temperature-scaled (T=2, sqrt) training mixture: per-source share and " +
        "integer budget; sqrt is IEEE-exact so shares hash-compare, and the weight " +
        "total folds in sorted source order (float addition is order-sensitive)"),

    // ---- Epoch-budget plan — the "how many epochs before each source
    // repeats" table a training schedule is built from: per language,
    // available tokens, temperature-weighted per-epoch allocation
    // (sqrt weights, ordered fold, floor — the prep_mix_temperature
    // contract on TOKENS), epochs-to-exhaustion (integer division), and
    // the exact repetition factor after a 4-epoch run at 1e2 scale —
    // the multi-epoch data-reuse exposure number (Muennighoff et al.).
    GQuery("prep_epoch_plan",
      (s, dir) => {
        val avail = Tables.documents(s, dir)
          .groupBy(col("lang"))
          .agg(sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("avail_tokens"))
          .withColumn("weight", sqrt(col("avail_tokens").cast("double")))
        val total = avail
          .agg(expr(
            """aggregate(transform(sort_array(collect_list(struct(lang, weight))),
                 x -> x.weight), 0D, (acc, w) -> acc + w)""")
            .as("w_total"))
        avail.crossJoin(broadcast(total))
          .withColumn("alloc_per_epoch",
            expr("CAST(floor(weight / w_total * 50000) AS BIGINT)"))
          .select(col("lang"), col("avail_tokens"), col("weight"),
            col("alloc_per_epoch"),
            when(col("alloc_per_epoch") === 0, lit(null).cast("long"))
              .otherwise(expr("avail_tokens div alloc_per_epoch")).as("epochs_to_exhaust"),
            expr("alloc_per_epoch * 4 * 100 div avail_tokens").as("repeat_4ep_e2"))
          .orderBy(col("lang").asc_nulls_first)
      },
      Some("""WITH a AS (
                SELECT lang,
                       CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS avail_tokens
                FROM documents GROUP BY lang),
              w AS (SELECT lang, avail_tokens,
                           sqrt(CAST(avail_tokens AS DOUBLE)) AS weight FROM a),
              t AS (SELECT list_sum(list(weight ORDER BY lang NULLS FIRST)) AS w_total FROM w)
              SELECT lang, avail_tokens, weight,
                     CAST(floor(weight / w_total * 50000) AS BIGINT) AS alloc_per_epoch,
                     CASE WHEN CAST(floor(weight / w_total * 50000) AS BIGINT) = 0 THEN NULL
                          ELSE avail_tokens // CAST(floor(weight / w_total * 50000) AS BIGINT)
                     END AS epochs_to_exhaust,
                     CAST(floor(weight / w_total * 50000) AS BIGINT) * 4 * 100
                       // avail_tokens AS repeat_4ep_e2
              FROM w, t ORDER BY lang NULLS FIRST"""),
      doc = "epoch-budget plan per language: token availability, temperature " +
        "allocation per epoch, epochs-to-exhaustion, exact 4-epoch repetition " +
        "factor — the multi-epoch data-reuse exposure table"),

    // ---- ENTITY-CONSISTENT cross-table sampling: the same deterministic
    // hash predicate on the entity key samples BOTH the dim and the fact,
    // so every sampled event's user is in the sampled dim (the census
    // COMPUTES the orphan count rather than assuming it) and per-entity
    // aggregates stay unbiased. Independent Bernoulli per table would
    // orphan ~90% of joined rows at a 10% rate; this is the correlated-
    // sampling technique a warehouse uses to build a coherent 1/10 dev
    // environment. Pure per-row hash + three aggregates; the 10× scale-up
    // estimate lands next to the exact total as the built-in error report.
    GQuery("prep_consistent_sample",
      (s, dir) => {
        def keep(c: String) = expr(
          s"CAST(conv(substring(md5(CAST($c AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100 < 10")
        val cust = Tables.customer(s, dir)
        val ev = Tables.events(s, dir)
        val sCust = cust.filter(keep("c_custkey"))
        val sEv = ev.filter(keep("user_id"))
        val orphans = sEv.join(
          sCust.select(col("c_custkey").as("user_id")), Seq("user_id"), "left_anti")
        val nonCust = ev.join(
          cust.select(col("c_custkey").as("user_id")), Seq("user_id"), "left_anti")
        sCust.agg(count(lit(1)).as("n_users_sampled")).crossJoin(
            sEv.agg(count(lit(1)).as("n_events_sampled")))
          .crossJoin(orphans.agg(count(lit(1)).as("orphan_events")))
          .crossJoin(nonCust.agg(count(lit(1)).as("noncustomer_events")))
          .crossJoin(ev.agg(count(lit(1)).as("n_events_total")))
          .withColumn("scaled_estimate", col("n_events_sampled") * 10)
      },
      Some("""WITH sc AS (SELECT c_custkey FROM customer
                          WHERE CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 10),
                   se AS (SELECT user_id FROM events
                          WHERE CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 10)
              SELECT (SELECT count(*) FROM sc) AS n_users_sampled,
                     (SELECT count(*) FROM se) AS n_events_sampled,
                     (SELECT count(*) FROM se
                      WHERE NOT EXISTS (SELECT 1 FROM sc WHERE sc.c_custkey = se.user_id))
                       AS orphan_events,
                     (SELECT count(*) FROM events e
                      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
                       AS noncustomer_events,
                     (SELECT count(*) FROM events) AS n_events_total,
                     (SELECT count(*) FROM se) * 10 AS scaled_estimate"""),
      doc = "entity-consistent 10% sampling across dim + fact by one hash " +
        "predicate: computed orphan census (join integrity) + 10x scale-up " +
        "estimate vs exact total"),

    GQuery("prep_stratified_sample",
      (s, dir) => TrainPrep.sampleCensus(Tables.documents(s, dir),
          rates = mixRates, defaultRate = 10)
        .orderBy(col("lang")),
      Some("""WITH r AS (
                SELECT lang,
                       CAST('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100 AS bkt,
                       CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 50
                                 WHEN 'zh' THEN 100 ELSE 10 END AS rate
                FROM documents)
              SELECT lang,
                     count(*) AS n_total,
                     CAST(SUM(CASE WHEN bkt < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
                     CAST(SUM(CASE WHEN bkt < rate THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS achieved_rate
              FROM r GROUP BY lang ORDER BY lang"""),
      doc = "deterministic per-language hash-bucket sampling census (training-mix lever)"),

    GQuery("prep_pack_sequences",
      (s, dir) => TrainPrep.packSequences(Tables.documents(s, dir), seqLen = 64)
        .orderBy(col("doc_id"), col("seq_no")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                   e AS (SELECT doc_id, toks,
                                unnest(range(0, CAST(ceil(len(toks) / 64.0) AS BIGINT))) AS seq_no
                         FROM t)
              SELECT doc_id, CAST(seq_no AS INT) AS seq_no,
                     CAST(len(list_slice(toks, CAST(seq_no * 64 + 1 AS INT),
                                               CAST(seq_no * 64 + 64 AS INT))) AS INT) AS n_toks,
                     md5(array_to_string(list_slice(toks, CAST(seq_no * 64 + 1 AS INT),
                                                          CAST(seq_no * 64 + 64 AS INT)), ' ')) AS seq_hash
              FROM e ORDER BY doc_id, seq_no"""),
      doc = "fixed-length token-window packing, content-addressed by md5 (trainer input unit)"),

    // ---- First-fit-decreasing packing census: the measured bins/waste
    // number next to prep_pack_sequences' fixed windows. Per-shard FFD
    // (the loader's own sharding), fold order pinned (len desc, doc_id),
    // Spark aggregate HOF == DuckDB list_reduce with the list-wrapped
    // accumulator (acc type must equal element type: elements ride as
    // [len], acc is the bin-load list; DuckDB lambda indexes are 1-based
    // where Spark's are 0-based, so the two mirrors are written apart).
    GQuery("prep_pack_ffd",
      (s, dir) => TrainPrep.ffdPackCensus(Tables.documents(s, dir),
          capacity = 96, nShards = 8)
        .orderBy(col("shard")),
      Some("""WITH lens AS (
              |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
              |         CAST(doc_id % 8 AS INT) AS shard
              |  FROM documents),
              |fit AS (
              |  SELECT shard, count(*) AS n_docs,
              |         CAST(SUM(len) AS BIGINT) AS total_tokens,
              |         list_reduce(list_prepend(CAST([] AS BIGINT[]),
              |             list_transform(list(len ORDER BY len DESC, doc_id),
              |               l -> [l])),
              |           (acc, x) -> CASE
              |             WHEN list_position(list_transform(acc,
              |                    b -> b + x[1] <= 96), true) = 0
              |               THEN list_append(acc, x[1])
              |             ELSE list_transform(acc, (b, i) ->
              |               CASE WHEN i = list_position(list_transform(acc,
              |                             b2 -> b2 + x[1] <= 96), true)
              |                    THEN b + x[1] ELSE b END)
              |           END) AS bins
              |  FROM lens WHERE len <= 96 GROUP BY shard),
              |ovr AS (
              |  SELECT shard, count(*) AS n_oversize,
              |         CAST(SUM(len) AS BIGINT) AS oversize_tokens
              |  FROM lens WHERE len > 96 GROUP BY shard)
              |SELECT shard,
              |       CAST(COALESCE(f.n_docs, 0) AS BIGINT) AS n_docs,
              |       CAST(COALESCE(f.total_tokens, 0) AS BIGINT) AS total_tokens,
              |       CAST(COALESCE(len(f.bins), 0) AS BIGINT) AS n_bins_ffd,
              |       CAST(COALESCE(len(f.bins) * 96 - f.total_tokens, 0) AS BIGINT) AS ffd_waste,
              |       CAST(f.total_tokens * 10000 // (len(f.bins) * 96) AS BIGINT) AS fill_e4,
              |       CAST(COALESCE(f.n_docs * 96 - f.total_tokens, 0) AS BIGINT) AS baseline_waste,
              |       CAST(COALESCE(o.n_oversize, 0) AS BIGINT) AS n_oversize,
              |       CAST(COALESCE(o.oversize_tokens, 0) AS BIGINT) AS oversize_tokens
              |FROM fit f FULL JOIN ovr o USING (shard)
              |ORDER BY shard""".stripMargin),
      doc = "first-fit-decreasing bin packing census per shard (capacity " +
        "96): FFD bins, padding waste and bin fill at 1e4 vs the " +
        "one-sequence-per-doc baseline waste; oversize docs censused to " +
        "the splitter"),

    // ---- Capacity sweep: the "pick your sequence length" card — the
    // same FFD fold at capacity 32/64/96/128, aggregated corpus-wide.
    // Shorter sequences cut attention FLOPs but push docs to the
    // splitter (n_oversize) and waste pad tokens; the card prices the
    // whole trade from one tokenize pass (lengths checkpointed, every
    // arm a per-shard fold + one 8-row aggregate).
    GQuery("prep_pack_capacity_report",
      (s, dir) => TrainPrep.packCapacityReport(Tables.documents(s, dir),
          capacities = Seq(32, 64, 96, 128), nShards = 8)
        .orderBy(col("capacity")),
      Some {
        def armSql(cap: Int): String =
          s"""SELECT CAST($cap AS BIGINT) AS capacity,
             |       CAST((SELECT SUM(n_docs) FROM f$cap) AS BIGINT) AS n_docs,
             |       (SELECT count(*) FROM lens WHERE len > $cap) AS n_oversize,
             |       CAST((SELECT SUM(len(bins)) FROM f$cap) AS BIGINT) AS n_bins,
             |       CAST((SELECT SUM(total_tokens) FROM f$cap) AS BIGINT) AS total_tokens""".stripMargin
        def fitSql(cap: Int): String =
          s"""f$cap AS (
             |  SELECT shard, count(*) AS n_docs,
             |         CAST(SUM(len) AS BIGINT) AS total_tokens,
             |         list_reduce(list_prepend(CAST([] AS BIGINT[]),
             |             list_transform(list(len ORDER BY len DESC, doc_id),
             |               l -> [l])),
             |           (acc, x) -> CASE
             |             WHEN list_position(list_transform(acc,
             |                    b -> b + x[1] <= $cap), true) = 0
             |               THEN list_append(acc, x[1])
             |             ELSE list_transform(acc, (b, i) ->
             |               CASE WHEN i = list_position(list_transform(acc,
             |                             b2 -> b2 + x[1] <= $cap), true)
             |                    THEN b + x[1] ELSE b END)
             |           END) AS bins
             |  FROM lens WHERE len <= $cap GROUP BY shard)""".stripMargin
        val caps = Seq(32, 64, 96, 128)
        s"""WITH lens AS (
           |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
           |         CAST(doc_id % 8 AS INT) AS shard
           |  FROM documents),
           |${caps.map(fitSql).mkString(",\n")}
           |SELECT capacity, n_docs, n_oversize, n_bins, total_tokens,
           |       n_bins * capacity - total_tokens AS ffd_waste,
           |       total_tokens * 10000 // (n_bins * capacity) AS fill_e4
           |FROM (${caps.map(armSql).mkString("\nUNION ALL\n")})
           |ORDER BY capacity""".stripMargin
      },
      doc = "FFD capacity sweep (32/64/96/128): corpus-wide bins, padding " +
        "waste, fill at 1e4 and splitter pressure per candidate sequence " +
        "length — one tokenize pass, arms share the checkpointed lengths"),

    // ---- Next-fit: the ONLINE packing discipline — a streaming loader
    // sees docs in manifest order and keeps ONE open bin, so its fold
    // state is (bins, open load) and its waste is what the one-pass
    // constraint costs vs the same shard's FFD floor. Both folds ride
    // the same checkpointed tokenize pass; the census emits the online
    // penalty in bins per shard.
    GQuery("prep_pack_nextfit",
      (s, dir) => TrainPrep.nextFitPackCensus(Tables.documents(s, dir),
          capacity = 96, nShards = 8)
        .orderBy(col("shard")),
      Some("""WITH lens AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
             |         CAST(doc_id % 8 AS INT) AS shard
             |  FROM documents WHERE len(string_split(text, ' ')) <= 96),
             |f AS (
             |  SELECT shard, count(*) AS n_docs,
             |         CAST(SUM(len) AS BIGINT) AS total_tokens,
             |         list_reduce(list_prepend([CAST(0 AS BIGINT), CAST(96 AS BIGINT)],
             |             list_transform(list(len ORDER BY doc_id),
             |               l -> [l, CAST(0 AS BIGINT)])),
             |           (acc, x) -> CASE WHEN acc[2] + x[1] <= 96
             |                            THEN [acc[1], acc[2] + x[1]]
             |                            ELSE [acc[1] + 1, x[1]] END) AS nf,
             |         list_reduce(list_prepend(CAST([] AS BIGINT[]),
             |             list_transform(list(len ORDER BY len DESC, doc_id),
             |               l -> [l])),
             |           (acc, x) -> CASE
             |             WHEN list_position(list_transform(acc,
             |                    b -> b + x[1] <= 96), true) = 0
             |               THEN list_append(acc, x[1])
             |             ELSE list_transform(acc, (b, i) ->
             |               CASE WHEN i = list_position(list_transform(acc,
             |                             b2 -> b2 + x[1] <= 96), true)
             |                    THEN b + x[1] ELSE b END)
             |           END) AS bins
             |  FROM lens GROUP BY shard)
             |SELECT shard, n_docs, total_tokens,
             |       nf[1] AS n_bins_nf,
             |       CAST(len(bins) AS BIGINT) AS n_bins_ffd,
             |       nf[1] * 96 - total_tokens AS nf_waste,
             |       CAST(len(bins) AS BIGINT) * 96 - total_tokens AS ffd_waste,
             |       nf[1] - CAST(len(bins) AS BIGINT) AS online_penalty_bins
             |FROM f ORDER BY shard""".stripMargin),
      doc = "next-fit (online, one open bin, manifest order) vs FFD " +
        "(offline floor) packing census per shard at capacity 96: the " +
        "measured bin/waste penalty the one-pass streaming-loader " +
        "constraint costs — both folds off one checkpointed tokenize pass"),

    // ---- Split-then-pack: prep_pack_ffd's splitter half — oversize
    // docs cut into capacity windows (full windows + remainder), pieces
    // rejoin the in-capacity docs, the whole shard FFD-packs; nothing
    // censused out, so ffd_waste is the corpus's TRUE padding floor at
    // this capacity. Fold/order rules identical to prep_pack_ffd
    // (the two DuckDB mirrors share every cross-engine convention).
    GQuery("prep_pack_split",
      (s, dir) => TrainPrep.splitPackCensus(Tables.documents(s, dir),
          capacity = 96, nShards = 8)
        .orderBy(col("shard")),
      Some("""WITH lens AS (
              |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
              |         CAST(doc_id % 8 AS INT) AS shard
              |  FROM documents),
              |pieces AS (
              |  SELECT shard, doc_id, len,
              |         unnest(range(0, CAST(ceil(len / 96.0) AS BIGINT))) AS piece_no
              |  FROM lens),
              |p2 AS (
              |  SELECT shard, doc_id, CAST(piece_no AS INT) AS piece_no,
              |         least(96, len - piece_no * 96) AS plen
              |  FROM pieces),
              |fit AS (
              |  SELECT shard, count(DISTINCT doc_id) AS n_docs,
              |         count(*) AS n_pieces,
              |         CAST(SUM(CASE WHEN piece_no > 0 THEN 1 ELSE 0 END) AS BIGINT)
              |           AS n_overflow_pieces,
              |         CAST(SUM(plen) AS BIGINT) AS total_tokens,
              |         list_reduce(list_prepend(CAST([] AS BIGINT[]),
              |             list_transform(list(plen ORDER BY plen DESC, doc_id, piece_no),
              |               l -> [l])),
              |           (acc, x) -> CASE
              |             WHEN list_position(list_transform(acc,
              |                    b -> b + x[1] <= 96), true) = 0
              |               THEN list_append(acc, x[1])
              |             ELSE list_transform(acc, (b, i) ->
              |               CASE WHEN i = list_position(list_transform(acc,
              |                             b2 -> b2 + x[1] <= 96), true)
              |                    THEN b + x[1] ELSE b END)
              |           END) AS bins
              |  FROM p2 GROUP BY shard)
              |SELECT shard, CAST(n_docs AS BIGINT) AS n_docs,
              |       CAST(n_pieces AS BIGINT) AS n_pieces,
              |       n_overflow_pieces, total_tokens,
              |       CAST(len(bins) AS BIGINT) AS n_bins_ffd,
              |       CAST(len(bins) * 96 - total_tokens AS BIGINT) AS ffd_waste,
              |       CAST(total_tokens * 10000 // (len(bins) * 96) AS BIGINT) AS fill_e4
              |FROM fit ORDER BY shard""".stripMargin),
      doc = "split-then-pack census (capacity 96): oversize docs cut into " +
        "capacity windows, pieces FFD-packed with the in-capacity docs — " +
        "nothing censused out; ffd_waste = the corpus's true padding floor"),

    // ---- Weighted interleaving schedule: the dataloader's emission
    // order under proportional stream sampling, exact (virtual time =
    // rank/weight via integer 1e6 division) — any schedule prefix holds
    // the mixing ratio, not just the expectation. First 64 positions.
    GQuery("prep_interleave_schedule",
      (s, dir) => TrainPrep.interleaveSchedule(Tables.documents(s, dir),
        Map("en" -> 500, "de" -> 200, "zh" -> 150, "es" -> 100, "fr" -> 50),
        take = 64),
      Some("""WITH w AS (SELECT * FROM (VALUES ('en', 500), ('de', 200),
              |            ('zh', 150), ('es', 100), ('fr', 50)) AS t(lang, wt)),
              |r AS (SELECT d.doc_id, d.lang, w.wt,
              |             ROW_NUMBER() OVER (PARTITION BY d.lang
              |                                ORDER BY d.doc_id) AS rk
              |      FROM documents d JOIN w USING (lang)),
              |v AS (SELECT doc_id, lang,
              |             CAST(rk * 1000000 // wt AS BIGINT) AS virtual_e6
              |      FROM r),
              |h AS (SELECT * FROM v ORDER BY virtual_e6, lang, doc_id LIMIT 64)
              |SELECT CAST(ROW_NUMBER() OVER (ORDER BY virtual_e6, lang, doc_id)
              |            AS INT) AS position,
              |       lang, doc_id, virtual_e6
              |FROM h ORDER BY position""".stripMargin),
      doc = "weighted dataset-interleave schedule (first 64 positions): " +
        "virtual time = per-stream rank / weight as exact integer 1e6 — " +
        "the proportional sampling order a training dataloader emits"),

    GQuery("prep_shard_assignment",
      (s, dir) => TrainPrep.shardByTokenBudget(Tables.documents(s, dir), budget = 8192)
        .orderBy(col("doc_id")),
      // oracle uses the GLOBAL window form the scalable bucketed scan must equal
      Some("""WITH t AS (SELECT doc_id,
                               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                        FROM documents),
                   c AS (SELECT doc_id, n_tokens,
                                CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                         FROM t)
              SELECT doc_id, n_tokens, cum_tokens,
                     CAST((cum_tokens - n_tokens) // 8192 AS INT) AS shard
              FROM c ORDER BY doc_id"""),
      doc = "token-budget sharding via a scalable two-level prefix sum (== global window cumsum)"),

    // ---- Systematic weighted sampling: n = 500 midpoint positions on the
    // exact cumulative token-weight axis (scalable two-level prefix sum);
    // pick counts by pure integer arithmetic — the PRNG-free weighted
    // sample whose multiplicities are proportional to weight and total
    // EXACTLY n. Oracle runs the naive global-window form.
    GQuery("prep_systematic_sample",
      (s, dir) => TrainPrep.systematicSample(Tables.documents(s, dir), n = 500L)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id,
                               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                        FROM documents),
                   c AS (SELECT doc_id, n_tokens,
                                CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                         FROM t),
                   tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS w_total FROM t),
                   p AS (SELECT doc_id, n_tokens, cum_tokens,
                                (CASE WHEN 2 * 500 * cum_tokens <= 0 THEN 0
                                      ELSE ((2 * 500 * cum_tokens - 1) // w_total + 1) // 2 END)
                              - (CASE WHEN 2 * 500 * (cum_tokens - n_tokens) <= 0 THEN 0
                                      ELSE ((2 * 500 * (cum_tokens - n_tokens) - 1) // w_total + 1) // 2 END)
                                AS n_picks
                         FROM c, tot)
              SELECT doc_id, n_tokens, cum_tokens, CAST(n_picks AS BIGINT) AS n_picks
              FROM p WHERE n_picks > 0 ORDER BY doc_id"""),
      doc = "deterministic systematic weighted sampling (n=500 midpoints on the " +
        "exact token-weight axis; integer pick counts, sum exactly n) == " +
        "global-window oracle"),

    // ---- Distribution-drift gate: token-length deciles FROZEN on the
    // reference split (docs with id % 3 != 0), the candidate batch
    // (id % 3 = 0) counted into them; per-10k integer proportions + L1
    // shift per bucket. The boundary pass runs over the bounded per-value
    // histogram, never the corpus.
    GQuery("prep_drift_census",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        TrainPrep.driftCensus(
          docs.filter(col("doc_id") % 3 =!= 0),
          docs.filter(col("doc_id") % 3 === 0),
          "n_tokens", nBuckets = 10)
          .orderBy(col("bucket"))
      },
      Some("""WITH d AS (SELECT doc_id,
                               CAST(len(string_split(text, ' ')) AS BIGINT) AS v
                        FROM documents),
                   ref AS (SELECT v FROM d WHERE doc_id % 3 <> 0),
                   cand AS (SELECT v FROM d WHERE doc_id % 3 = 0),
                   hist AS (SELECT v, count(*) AS c FROM ref GROUP BY v),
                   cum AS (SELECT v, c,
                                  SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
                           FROM hist),
                   n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
                   bounds AS (
                     SELECT i.i AS i, MIN(cum.v) AS b
                     FROM cum, n, (SELECT unnest(range(1, 10)) AS i) i
                     WHERE cum.cum >= (i.i * n.n + 9) // 10
                     GROUP BY i.i),
                   tagged AS (SELECT v, 'ref' AS side FROM ref
                              UNION ALL SELECT v, 'cand' AS side FROM cand),
                   bk AS (SELECT t.v, t.side,
                                 CAST(1 + (SELECT count(*) FROM bounds b
                                           WHERE b.b < t.v) AS INT) AS bucket
                          FROM tagged t),
                   cs AS (SELECT bucket,
                                 count(CASE WHEN side = 'ref' THEN 1 END) AS n_ref,
                                 count(CASE WHEN side = 'cand' THEN 1 END) AS n_cand
                          FROM bk GROUP BY bucket),
                   tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
                                  CAST(SUM(n_cand) AS BIGINT) AS t_cand FROM cs)
              SELECT bucket, n_ref, n_cand,
                     CAST(n_ref * 10000 // t_ref AS BIGINT) AS pct_ref,
                     CAST(n_cand * 10000 // t_cand AS BIGINT) AS pct_cand,
                     CAST(abs(n_ref * 10000 // t_ref - n_cand * 10000 // t_cand) AS BIGINT)
                       AS shift_per_10k
              FROM cs, tot ORDER BY bucket"""),
      doc = "train/serve drift census: candidate batch counted into frozen " +
        "reference deciles (integer rank boundaries over the bounded " +
        "histogram); per-10k proportions + L1 shift, all integer"),

    // ---- Length-bucketed batching census: group documents into 32-token
    // length buckets and report the padding cost of batching per bucket
    // versus padding the whole corpus to its max — the dynamic-batching
    // decision a trainer makes to cut pad FLOPs, quantified exactly.
    GQuery("prep_length_buckets",
      (s, dir) => {
        val t = Tables.documents(s, dir).select(
          size(split(col("text"), " ")).cast("long").as("nt"))
        val g = t.agg(max(col("nt")).as("gmax"))
        t.crossJoin(broadcast(g))
          .withColumn("bucket", expr("nt div 32"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).as("n_tokens"),
            sum(expr("(bucket + 1) * 32 - nt")).as("bucket_pad_waste"),
            sum(expr("gmax - nt")).as("global_pad_waste"))
          .orderBy(col("bucket"))
      },
      Some("""WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
                         FROM documents),
                   g AS (SELECT CAST(max(nt) AS BIGINT) AS gmax FROM t)
              SELECT nt // 32 AS bucket, count(*) AS n_docs,
                     CAST(SUM(nt) AS BIGINT) AS n_tokens,
                     CAST(SUM((nt // 32 + 1) * 32 - nt) AS BIGINT) AS bucket_pad_waste,
                     CAST(SUM(gmax - nt) AS BIGINT) AS global_pad_waste
              FROM t, g GROUP BY bucket ORDER BY bucket"""),
      doc = "length-bucketed batching census: per-bucket exact padding waste vs " +
        "pad-to-corpus-max — the dynamic-batching FLOPs case, in integers"),

    GQuery("prep_mix_apply",
      (s, dir) => TrainPrep.applyMixture(Tables.documents(s, dir), budget = 300L)
        .orderBy(col("lang")),
      Some("""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
                   w AS (SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS weight FROM c),
                   t AS (SELECT list_sum(list(weight ORDER BY lang NULLS FIRST)) AS w_total FROM w),
                   mix AS (
                     SELECT lang, n_docs,
                            CAST(floor(weight / w_total * 300) AS BIGINT) AS n_budgeted,
                            10000 * CAST(floor(weight / w_total * 300) AS BIGINT) // n_docs AS threshold
                     FROM w, t),
                   s AS (
                     SELECT d.lang, count(*) AS n_sampled
                     FROM documents d JOIN mix USING (lang)
                     WHERE CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000
                           < mix.threshold
                     GROUP BY d.lang)
              SELECT mix.lang, mix.n_docs, mix.n_budgeted,
                     CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled
              FROM mix LEFT JOIN s USING (lang)
              ORDER BY mix.lang NULLS FIRST"""),
      doc = "temperature mixture APPLIED: integer per-10k hash thresholds materialize " +
        "the computed mix deterministically; census reports target vs achieved"),

    // ---- Curriculum staging: the corpus cut into equal-population
    // difficulty stages (difficulty = mean corpus frequency of the doc's
    // tokens, the text_rarity signal: LOW mean freq = rare-token-heavy =
    // hard) — the ordering a curriculum-learning schedule consumes. Same
    // two-level exact-ntile machinery as prep_range_shards, over a
    // COMPUTED key instead of a stored one.
    GQuery("prep_curriculum_stages",
      (s, dir) => TrainPrep.rangeStages(
          graft.ops.TextAnalysis.rarityStats(Tables.documents(s, dir))
            .select(col("doc_id"), col("mean_token_freq").as("difficulty")),
          "difficulty", shards = 6, bucketWidth = 25.0, outPrefix = "difficulty")
        .orderBy(col("shard")),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                           FROM documents),
                   freq AS (SELECT token, count(*) AS freq FROM tok GROUP BY 1),
                   r AS (SELECT doc_id,
                                CAST(SUM(freq) AS DOUBLE) / count(*) AS difficulty
                         FROM tok JOIN freq USING (token) GROUP BY doc_id),
                   st AS (SELECT doc_id, difficulty,
                                 CAST(ntile(6) OVER (ORDER BY difficulty, doc_id) AS INT)
                                   AS shard
                          FROM r)
              SELECT shard, count(*) AS n_docs,
                     min(difficulty) AS lo_difficulty,
                     max(difficulty) AS hi_difficulty
              FROM st GROUP BY shard ORDER BY shard"""),
      doc = "curriculum stages: equal-population ntile over computed " +
        "token-rarity difficulty (two-level machinery, no global window)"),

    GQuery("prep_range_shards",
      (s, dir) => TrainPrep.rangeShardCensus(Tables.documents(s, dir), shards = 8)
        .orderBy(col("shard")),
      Some("""WITH s AS (SELECT doc_id, n_chars,
                               CAST(ntile(8) OVER (ORDER BY n_chars, doc_id) AS INT) AS shard
                        FROM documents)
              SELECT shard, count(*) AS n_docs,
                     min(n_chars) AS lo_chars, max(n_chars) AS hi_chars
              FROM s GROUP BY shard ORDER BY shard"""),
      doc = "equal-population range sharding (ntile) — the exact-boundary census " +
        "that feeds repartitionByRange"),

    GQuery("prep_global_shuffle",
      (s, dir) => TrainPrep.globalShuffle(Tables.documents(s, dir), nShards = 8)
        .orderBy(col("position")),
      Some("""WITH h AS (
                SELECT doc_id, lang,
                       CAST('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
                FROM documents),
              p AS (
                SELECT doc_id, lang,
                       ROW_NUMBER() OVER (ORDER BY h, doc_id) AS position
                FROM h)
              SELECT position, CAST((position - 1) % 8 AS INT) AS shard, doc_id, lang
              FROM p ORDER BY position"""),
      doc = "deterministic global corpus shuffle: salted-md5 total order → contiguous " +
        "global positions (range sort + per-partition offsets, no single-task window) " +
        "→ round-robin shards balanced to ±1 doc"),

    GQuery("prep_decontamination",
      (s, dir) => TrainPrep.decontaminationReport(Tables.documents(s, dir),
          n = 3, valPct = 5, testPct = 5, tau = 0.1)
        .orderBy(col("doc_id")),
      Some(s"""WITH s AS (
                SELECT doc_id, text,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100 AS b
                FROM documents),
              sh AS (
                SELECT doc_id, b, $hbaseSql AS hbase
                FROM s WHERE len(string_split(text, ' ')) >= 3),
              bench AS (SELECT DISTINCT unnest(hbase) AS h FROM sh WHERE b < 10),
              train AS (SELECT doc_id, hbase FROM sh WHERE b >= 10),
              ex AS (SELECT doc_id, unnest(hbase) AS h FROM train),
              hits AS (SELECT e.doc_id, count(*) AS n_contaminated
                       FROM ex e JOIN bench USING (h) GROUP BY e.doc_id)
              SELECT t.doc_id, CAST(len(t.hbase) AS INT) AS n_shingles,
                     CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
                     CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / len(t.hbase) AS contamination,
                     CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / len(t.hbase) >= 0.1 AS is_contaminated
              FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
              ORDER BY t.doc_id"""),
      doc = "benchmark decontamination: train-doc shingle overlap against the held-out split"),

    // ---- Largest-remainder (Hamilton) apportionment: the exact-allocation
    // fix for temperatureMixture's floor-only budgets — Σ n_alloc equals
    // the budget EXACTLY, each stratum within 1 of its real share, all
    // integer arithmetic over the bounded per-stratum table (the same
    // algorithm as parliamentary seats). Tie order pinned (rem desc, lang
    // asc NULLS FIRST) so the +1 winners hash-compare cross-engine.
    GQuery("prep_apportion_budget",
      (s, dir) => TrainPrep.apportionBudget(Tables.documents(s, dir), budget = 10000L)
        .orderBy(asc_nulls_first("lang")),
      Some("""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
                   b AS (SELECT lang, n_docs,
                                CAST(SUM(n_docs) OVER () AS BIGINT) AS n_total
                         FROM c),
                   e AS (SELECT lang, n_docs,
                                10000 * n_docs // n_total AS base,
                                10000 * n_docs % n_total AS rem
                         FROM b),
                   s AS (SELECT *,
                                10000 - CAST(SUM(base) OVER () AS BIGINT) AS short,
                                ROW_NUMBER() OVER (ORDER BY rem DESC,
                                                   lang ASC NULLS FIRST) AS rk
                         FROM e)
              SELECT lang, n_docs,
                     CAST(base + CASE WHEN rk <= short THEN 1 ELSE 0 END
                          AS BIGINT) AS n_alloc
              FROM s ORDER BY lang NULLS FIRST"""),
      doc = "largest-remainder (Hamilton) budget apportionment across language " +
        "strata: exact integer allocation summing to the budget, each stratum " +
        "within 1 of its real share"),

    // ---- Shard shipping manifest — what a training run's data loader
    // verifies before reading a shard: per shard the doc count, token
    // total, id range, and an order-independent content checksum
    // (bit_xor of per-doc md5 longs — the audit_merkle_diff digest
    // algebra applied to the shard grain). One doc-keyed pass, one
    // 16-row output.
    GQuery("prep_shard_manifest",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("shard", (col("doc_id") % 16).cast("int"))
        .withColumn("rh", expr(
          "CAST(conv(substring(md5(concat_ws('|', doc_id, text)), 1, 15), 16, 10) AS BIGINT)"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("total_tokens"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
          expr("bit_xor(rh)").as("content_checksum"))
        .orderBy(col("shard")),
      Some("""SELECT CAST(doc_id % 16 AS INT) AS shard,
                     count(*) AS n_docs,
                     CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
                     MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
                     bit_xor(CAST('0x' || substr(md5(doc_id || '|' || text), 1, 15) AS BIGINT)) AS content_checksum
              FROM documents GROUP BY 1 ORDER BY shard"""),
      doc = "shard shipping manifest: per-shard doc/token counts, id range, " +
        "order-independent bit_xor content checksum (loader-side integrity gate)"),

    // ---- Balanced class weights (sklearn's class_weight='balanced'):
    // w_c = N / (K·n_c) as an exact 1e4 rational — the loss-reweighting
    // table for a skewed label distribution, dual of the apportionment
    // query (which moves the DATA; this moves the GRADIENT). One bounded
    // groupBy + two broadcast scalars.
    GQuery("prep_class_weights",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val tot = emb.agg(count(lit(1)).as("n_total"),
          countDistinct(col("label")).as("n_classes"))
        emb.groupBy(col("label")).agg(count(lit(1)).as("n_c"))
          .crossJoin(broadcast(tot))
          .withColumn("weight_e4",
            expr("n_total * 10000 div (n_classes * n_c)"))
          .select(col("label"), col("n_c"), col("n_total"),
            col("n_classes"), col("weight_e4"))
          .orderBy(col("label"))
      },
      Some("""WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
                                CAST(count(DISTINCT label) AS BIGINT) AS n_classes
                         FROM embeddings),
              g AS (SELECT label, CAST(count(*) AS BIGINT) AS n_c
                    FROM embeddings GROUP BY label)
              SELECT g.label, g.n_c, t.n_total, t.n_classes,
                     t.n_total * 10000 // (t.n_classes * g.n_c) AS weight_e4
              FROM g, t ORDER BY g.label"""),
      doc = "balanced class weights: N/(K*n_c) as exact 1e4 rationals — the " +
        "loss-reweighting dual of data-side apportionment"),

    // ---- DSIR importance weights (Xie et al. 2023): hashed-bigram
    // feature LM ratio target-vs-raw, add-one smoothed, per-feature
    // log-ratio as exact ±integer bits (binary-length floor-log2 on
    // DECIMAL-safe cross products), summed per doc over feature
    // OCCURRENCES. Per-language census; the target language should
    // dominate the weight>0 selected set. 1024-bucket λ table broadcast;
    // no windows, no corpus broadcast.
    GQuery("prep_dsir_census",
      (s, dir) => TrainPrep.dsirCensus(Tables.documents(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t
              |             FROM documents),
              |bi AS (
              |  SELECT doc_id, lang,
              |         CAST('0x' || substr(md5(t[CAST(i AS INT)] || ' '
              |                || t[CAST(i AS INT) + 1]), 1, 8) AS BIGINT) % 1024 AS b
              |  FROM (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i FROM toks)),
              |raw AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM bi GROUP BY b),
              |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS ct
              |        FROM bi WHERE lang = 'en' GROUP BY b),
              |tot AS (SELECT (SELECT CAST(SUM(cr) AS BIGINT) FROM raw) AS nr,
              |               (SELECT CAST(SUM(ct) AS BIGINT) FROM tgt) AS nt),
              |lam AS (
              |  SELECT r.b,
              |         CASE WHEN CAST(t2.nr AS HUGEINT) * (COALESCE(g.ct, 0) + 1)
              |                   >= CAST(t2.nt AS HUGEINT) * (r.cr + 1)
              |              THEN CAST(length(printf('%b',
              |                     CAST(CAST(t2.nr AS HUGEINT) * (COALESCE(g.ct, 0) + 1)
              |                          // (CAST(t2.nt AS HUGEINT) * (r.cr + 1)) AS BIGINT)))
              |                   - 1 AS BIGINT)
              |              ELSE -CAST(length(printf('%b',
              |                     CAST(CAST(t2.nt AS HUGEINT) * (r.cr + 1)
              |                          // (CAST(t2.nr AS HUGEINT) * (COALESCE(g.ct, 0) + 1))
              |                          AS BIGINT))) - 1 AS BIGINT) END AS lam
              |  FROM raw r LEFT JOIN tgt g ON g.b = r.b, tot t2),
              |dw AS (SELECT bi.doc_id, CAST(SUM(l.lam) AS BIGINT) AS w
              |       FROM bi JOIN lam l ON l.b = bi.b GROUP BY bi.doc_id),
              |d AS (SELECT doc.lang, COALESCE(dw.w, 0) AS w
              |      FROM documents doc LEFT JOIN dw ON dw.doc_id = doc.doc_id)
              |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(SUM(w) AS BIGINT) AS w_sum,
              |       CAST(CASE WHEN SUM(w) < 0
              |                 THEN -((-(100 * CAST(SUM(w) AS HUGEINT))) // count(*))
              |                 ELSE (100 * CAST(SUM(w) AS HUGEINT)) // count(*) END
              |            AS BIGINT) AS w_mean_e2,
              |       CAST(count(CASE WHEN w > 0 THEN 1 END) AS BIGINT) AS n_selected
              |FROM d GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "DSIR importance-weight census: hashed-bigram target/raw LM " +
        "ratio in exact ±integer bits, per-doc occurrence sum, per-language " +
        "selection readout — data selection that looks like the target domain"),

    // ---- Rendezvous (HRW) resharding churn: 8→9 shards moves ~1/9 of
    // keys under highest-random-weight hashing vs ~8/9 under mod-N — the
    // measured consistent-hashing decision table. One distinct contraction,
    // a 9-row broadcast explode, two conditional lexicographic argmaxes in
    // one partial-aggregable groupBy.
    GQuery("prep_rendezvous_reshard",
      (s, dir) => TrainPrep.rendezvousReshardCensus(Tables.events(s, dir)),
      Some("""WITH k AS (SELECT DISTINCT user_id FROM events),
              |e AS (SELECT user_id, s,
              |             md5(CAST(user_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)) AS h
              |      FROM k, (SELECT unnest(range(0, 9)) AS s)),
              |a AS (SELECT user_id,
              |             max(CASE WHEN s < 8 THEN {'h': h, 's': s} END)['s'] AS s8,
              |             max({'h': h, 's': s})['s'] AS s9
              |      FROM e GROUP BY user_id),
              |hrw AS (SELECT 'hrw' AS scheme, CAST(count(*) AS BIGINT) AS n_keys,
              |               CAST(count(CASE WHEN s8 <> s9 THEN 1 END) AS BIGINT) AS n_moved
              |        FROM a),
              |md AS (SELECT 'mod' AS scheme, CAST(count(*) AS BIGINT) AS n_keys,
              |              CAST(count(CASE WHEN hk % 8 <> hk % 9 THEN 1 END) AS BIGINT)
              |                AS n_moved
              |       FROM (SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
              |                         AS BIGINT) AS hk FROM k))
              |SELECT scheme, n_keys, n_moved, 1000 * n_moved // n_keys AS moved_permille
              |FROM (SELECT * FROM hrw UNION ALL SELECT * FROM md)
              |ORDER BY scheme""".stripMargin),
      doc = "rendezvous-hash resharding churn census: HRW argmax vs mod-N " +
        "under 8→9 shard growth, measured moved-key permille — the " +
        "consistent-hashing stability proof")
  )
}
