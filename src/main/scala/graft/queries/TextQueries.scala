package graft.queries

import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.ops.TextAnalysis

/** Text-analysis operators over `documents`, each with a DuckDB oracle.
  * Scores are integer counts with one final double division → exact
  * cross-engine match (see Ledger.scala numeric strategy).
  */
object TextQueries {

  private val toksSql = "string_split(text, ' ')"

  private val bpeRounds = 6

  /** Unrolled BPE training rounds as a DuckDB CTE chain: w0 = distinct-word
    * vocab with per-character symbol lists; per round r, pr = weighted pair
    * census, br = deterministic argmax, wr = the merge applied with GREEDY
    * LEFT-TO-RIGHT semantics via islands + parity (ms = match positions;
    * within a run of consecutive matches only every other one merges,
    * starting from the first — `ds[j] = ms[j]-j` is constant within a run
    * and non-decreasing, so list_position finds the run's start).
    */
  private def bpeCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""w0 AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         |         list_transform(range(1, length(word) + 1),
         |                        i -> substr(word, CAST(i AS INT), 1)) AS toks
         |  FROM (SELECT unnest($toksSql) AS word FROM documents)
         |  GROUP BY word)""".stripMargin)
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(s""",
         |p$r AS (
         |  SELECT p, CAST(sum(freq) AS BIGINT) AS f
         |  FROM (SELECT freq, unnest(list_transform(range(1, len(toks)),
         |          i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])) AS p
         |        FROM w$p)
         |  GROUP BY p),
         |b$r AS (
         |  SELECT f, string_split(p, ' ')[1] AS a, string_split(p, ' ')[2] AS b
         |  FROM p$r ORDER BY f DESC, p LIMIT 1),
         |w$r AS (
         |  SELECT word, freq,
         |         list_transform(
         |           list_filter(range(1, len(toks) + 1),
         |                       i -> NOT list_contains(kp, i - 1)),
         |           i -> CASE WHEN list_contains(kp, i) THEN a || b
         |                     ELSE toks[CAST(i AS INT)] END) AS toks
         |  FROM (
         |    SELECT word, freq, toks, a, b,
         |           list_transform(
         |             list_filter(range(1, len(ms) + 1),
         |               j -> (j - list_position(ds, ds[CAST(j AS INT)])) % 2 = 0),
         |             j -> ms[CAST(j AS INT)]) AS kp
         |    FROM (
         |      SELECT word, freq, toks, a, b, ms,
         |             list_transform(range(1, len(ms) + 1),
         |                            k -> ms[CAST(k AS INT)] - k) AS ds
         |      FROM (
         |        SELECT word, freq, toks, a, b,
         |               list_filter(range(1, len(toks)),
         |                 i -> toks[CAST(i AS INT)] = a
         |                      AND toks[CAST(i AS INT) + 1] = b) AS ms
         |        FROM w$p CROSS JOIN b$r))))""".stripMargin)
    }
    sb.toString
  }

  private lazy val bpeTrainSql: String = {
    val rows = (1 to bpeRounds)
      .map(r => s"SELECT $r AS round, a AS lhs, b AS rhs, f AS freq FROM b$r")
      .mkString("\nUNION ALL\n")
    s"WITH ${bpeCtes(bpeRounds)}\n$rows\nORDER BY round"
  }

  private lazy val bpeApplySql: String =
    s"""WITH ${bpeCtes(bpeRounds)}
       |SELECT d.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(len(w.toks)) AS BIGINT) AS n_bpe_tokens,
       |       CAST(sum(length(d.word)) AS BIGINT) AS n_chars
       |FROM (SELECT doc_id, unnest($toksSql) AS word FROM documents) d
       |JOIN w$bpeRounds w ON d.word = w.word
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---- unigram-LM tokenizer oracle (text_unigram_train / _apply) ----

  private val uniMaxWordLen = 16   // corpus max word length is 8; 2× margin
  private val uniMaxPieceLen = 4
  private val uniSeedMultis = 20
  private val uniPruneMultis = 12

  /** One EM round's Viterbi DP as an unrolled per-position CTE chain
    * (`s{r}_0` .. `s{r}_16`): state carries the dp list (position 0..j best
    * path probability — single IEEE double products, no reassociation) and
    * the per-position best path. Candidates at position j are pieces of
    * length 1..4 ending at j, looked up in `piecesCte` via LEFT JOINs;
    * argmax tie-breaks to the SHORTEST piece (first CASE match), matching
    * the native kernel's strict-greater L-ascending scan. Words shorter
    * than the step index pass through frozen.
    */
  private def uniViterbiChain(r: Int, piecesCte: String): String = {
    val sb = new StringBuilder
    sb.append(
      s"""s${r}_0 AS MATERIALIZED (
         |  SELECT word, freq, length(word) AS len,
         |         [CAST(1.0 AS DOUBLE)] AS dp,
         |         CAST([[]] AS VARCHAR[][]) AS paths
         |  FROM w0)""".stripMargin)
    for (j <- 1 to uniMaxWordLen) {
      val cands = (1 to uniMaxPieceLen).map { l =>
        if (j >= l) s"d.dp[${j - l + 1}] * q$l.prob AS c$l"
        else s"CAST(NULL AS DOUBLE) AS c$l"
      }.mkString(",\n               ")
      val joins = (1 to uniMaxPieceLen).filter(_ <= j).map { l =>
        s"LEFT JOIN $piecesCte q$l ON q$l.piece = substr(d.word, ${j - l + 1}, $l)"
      }.mkString("\n        ")
      sb.append(s""",
         |s${r}_$j AS MATERIALIZED (
         |  SELECT word, freq, len,
         |         CASE WHEN $j > len THEN dp ELSE list_append(dp, bs) END AS dp,
         |         CASE WHEN $j > len THEN paths
         |              ELSE list_append(paths,
         |                     list_append(paths[$j - bl + 1],
         |                                 substr(word, $j - bl + 1, bl))) END AS paths
         |  FROM (
         |    SELECT word, freq, len, dp, paths, bs,
         |           CASE WHEN c1 = bs THEN 1 WHEN c2 = bs THEN 2
         |                WHEN c3 = bs THEN 3 ELSE 4 END AS bl
         |    FROM (
         |      SELECT word, freq, len, dp, paths,
         |             greatest(coalesce(c1, -1), coalesce(c2, -1),
         |                      coalesce(c3, -1), coalesce(c4, -1)) AS bs,
         |             c1, c2, c3, c4
         |      FROM (
         |        SELECT d.word, d.freq, d.len, d.dp, d.paths,
         |               $cands
         |        FROM s${r}_${j - 1} d
         |        $joins))))""".stripMargin)
    }
    sb.toString
  }

  /** The full two-round unigram training CTE prefix: seed census (all
    * substrings ≤ 4 chars, freq-weighted, overlaps counted) → seed vocab
    * (all chars + top-20 multis) → round-1 Viterbi + usage census →
    * prune (chars floored at 1, top-12 multis) → round-2 Viterbi + census.
    */
  private lazy val uniCtes: String = {
    def probCte(raw: String, name: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT piece, CAST(cnt AS DOUBLE)
         |           / CAST((SELECT CAST(SUM(cnt) AS BIGINT) FROM $raw) AS DOUBLE) AS prob
         |  FROM $raw)""".stripMargin
    def usageCte(r: Int, vocabRaw: String): String =
      s"""u$r AS MATERIALIZED (
         |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS c
         |  FROM (SELECT freq, unnest(paths[len + 1]) AS piece FROM s${r}_$uniMaxWordLen)
         |  GROUP BY piece),
         |cnt$r AS MATERIALIZED (
         |  SELECT v.piece, COALESCE(u.c, CAST(0 AS BIGINT)) AS cnt
         |  FROM $vocabRaw v LEFT JOIN u$r u ON u.piece = v.piece)""".stripMargin
    s"""w0 AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($toksSql) AS word FROM documents)
       |  GROUP BY word),
       |sub AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, unnest(flatten(list_transform(range(1, ${uniMaxPieceLen + 1}),
       |          l -> CASE WHEN length(word) >= l
       |               THEN list_transform(range(1, length(word) - l + 2),
       |                      s -> substr(word, CAST(s AS INT), CAST(l AS INT)))
       |               ELSE CAST([] AS VARCHAR[]) END))) AS piece
       |        FROM w0)
       |  GROUP BY piece),
       |v1raw AS MATERIALIZED (
       |  SELECT piece, cnt FROM sub WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (SELECT piece, cnt FROM sub WHERE length(piece) >= 2
       |                          ORDER BY cnt DESC, piece LIMIT $uniSeedMultis)),
       |${probCte("v1raw", "v1")},
       |${uniViterbiChain(1, "v1")},
       |${usageCte(1, "v1raw")},
       |v2raw AS MATERIALIZED (
       |  SELECT piece, greatest(cnt, 1) AS cnt FROM cnt1 WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (SELECT piece, cnt FROM cnt1 WHERE length(piece) >= 2
       |                          ORDER BY cnt DESC, piece LIMIT $uniPruneMultis)),
       |${probCte("v2raw", "v2")},
       |${uniViterbiChain(2, "v2")},
       |${usageCte(2, "v2raw")}""".stripMargin
  }

  private lazy val uniTrainSql: String =
    s"""WITH $uniCtes
       |SELECT CAST(1 AS INT) AS round, piece, cnt FROM cnt1
       |UNION ALL
       |SELECT CAST(2 AS INT) AS round, piece, cnt FROM cnt2
       |ORDER BY round, cnt DESC, piece""".stripMargin

  /** DuckDB mirror of TextAnalysis.wordpieceApply: the same seed-vocab
    * CTEs (all chars + top-20 multis, count DESC piece ASC), then the
    * greedy longest-match fold as list_reduce over [pos, n_pieces]
    * BIGINT-list accumulators (acc type == element type). End-of-word
    * probes truncate to their shorter in-vocab string and over-advance
    * pos harmlessly — identical decisions to the Spark fold.
    */
  private lazy val wpApplySql: String = {
    val probes = (uniMaxPieceLen to 2 by -1).map(l =>
      s"WHEN list_contains(v, substr(word, CAST(acc[1] AS INT), $l)) " +
        s"THEN CAST($l AS BIGINT)").mkString("\n             ")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($toksSql) AS word FROM documents)
       |  GROUP BY word),
       |sub AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, unnest(flatten(list_transform(range(1, ${uniMaxPieceLen + 1}),
       |          l -> CASE WHEN length(word) >= l
       |               THEN list_transform(range(1, length(word) - l + 2),
       |                      s -> substr(word, CAST(s AS INT), CAST(l AS INT)))
       |               ELSE CAST([] AS VARCHAR[]) END))) AS piece
       |        FROM w0)
       |  GROUP BY piece),
       |v1raw AS MATERIALIZED (
       |  SELECT piece, cnt FROM sub WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (SELECT piece, cnt FROM sub WHERE length(piece) >= 2
       |                          ORDER BY cnt DESC, piece LIMIT $uniSeedMultis)),
       |vl AS (SELECT list(piece) AS v FROM v1raw),
       |seg AS MATERIALIZED (
       |  SELECT word,
       |    list_reduce(list_prepend([CAST(1 AS BIGINT), CAST(0 AS BIGINT)],
       |        list_transform(range(1, length(word) + 1),
       |          i -> [CAST(i AS BIGINT), CAST(0 AS BIGINT)])),
       |      (acc, x) -> CASE WHEN x[1] <> acc[1] THEN acc ELSE
       |        [acc[1] + CASE
       |             $probes
       |             ELSE CAST(1 AS BIGINT) END,
       |         acc[2] + CAST(1 AS BIGINT)] END)[2] AS n_wp
       |  FROM w0, vl)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(SUM(s.n_wp) AS BIGINT) AS n_wp_tokens,
       |       CAST(SUM(length(d.word)) AS BIGINT) AS n_chars
       |FROM (SELECT doc_id, unnest($toksSql) AS word FROM documents) d
       |JOIN seg s USING (word)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB mirror of TextAnalysis.wordpieceVocabReport: the shared
    * w0/sub censuses once, then per arm a chars+top-m vocab list (arms
    * are LIMIT prefixes of one ranked census) and the same greedy
    * list_reduce fold, aggregated to exact corpus token counts and the
    * integer tokens-per-million-chars compression.
    */
  private def wpVocabSql(multisArms: Seq[Int], maxPieceLen: Int): String = {
    val probes = (maxPieceLen to 2 by -1).map(l =>
      s"WHEN list_contains(v, substr(word, CAST(acc[1] AS INT), $l)) " +
        s"THEN CAST($l AS BIGINT)").mkString("\n             ")
    val armCtes = multisArms.map { m =>
      f"""vm$m%02d AS (
         |  SELECT piece FROM sub WHERE length(piece) = 1
         |  UNION ALL
         |  SELECT piece FROM (SELECT piece FROM sub WHERE length(piece) >= 2
         |                     ORDER BY cnt DESC, piece LIMIT $m%d)),
         |vl$m%02d AS (SELECT list(piece) AS v FROM vm$m%02d),
         |seg$m%02d AS MATERIALIZED (
         |  SELECT word, freq,
         |    list_reduce(list_prepend([CAST(1 AS BIGINT), CAST(0 AS BIGINT)],
         |        list_transform(range(1, length(word) + 1),
         |          i -> [CAST(i AS BIGINT), CAST(0 AS BIGINT)])),
         |      (acc, x) -> CASE WHEN x[1] <> acc[1] THEN acc ELSE
         |        [acc[1] + CASE
         |             $probes
         |             ELSE CAST(1 AS BIGINT) END,
         |         acc[2] + CAST(1 AS BIGINT)] END)[2] AS n_wp
         |  FROM w0, vl$m%02d)""".stripMargin
    }.mkString(",\n")
    val rows = multisArms.map { m =>
      f"""SELECT 'wp_m$m%02d' AS method, CAST($m%d AS BIGINT) AS n_multis,
         |       CAST(SUM(freq * n_wp) AS BIGINT) AS n_tokens,
         |       CAST(SUM(freq * length(word)) AS BIGINT) AS n_chars,
         |       CAST((1000000 * SUM(freq * n_wp)) // SUM(freq * length(word))
         |            AS BIGINT) AS tokens_per_mchar
         |FROM seg$m%02d""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($toksSql) AS word FROM documents)
       |  GROUP BY word),
       |sub AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, unnest(flatten(list_transform(range(1, ${maxPieceLen + 1}),
       |          l -> CASE WHEN length(word) >= l
       |               THEN list_transform(range(1, length(word) - l + 2),
       |                      s -> substr(word, CAST(s AS INT), CAST(l AS INT)))
       |               ELSE CAST([] AS VARCHAR[]) END))) AS piece
       |        FROM w0)
       |  GROUP BY piece),
       |$armCtes
       |SELECT method, n_multis, n_tokens, n_chars, tokens_per_mchar
       |FROM ($rows) ORDER BY method""".stripMargin
  }

  private lazy val uniApplySql: String =
    s"""WITH $uniCtes
       |SELECT d.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(SUM(len(s.paths[s.len + 1])) AS BIGINT) AS n_pieces,
       |       CAST(SUM(length(d.word)) AS BIGINT) AS n_chars
       |FROM (SELECT doc_id, unnest($toksSql) AS word FROM documents) d
       |JOIN s2_$uniMaxWordLen s ON d.word = s.word
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Shared BM25 oracle: text_bm25_search (direct scan) and
    * text_index_search_incremental (served from the persisted index) must
    * both equal it. */
  private lazy val bm25Sql: String =
    s"""WITH dl AS (
                |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl FROM documents),
                |corpus AS (
                |  SELECT count(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS corpus_len FROM dl),
                |tf AS (
                |  SELECT doc_id, t.term, count(*) AS tf
                |  FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents) t
                |  WHERE t.term IN ('spark', 'join', 'stream', 'filter')
                |  GROUP BY doc_id, t.term),
                |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
                |scored AS (
                |  SELECT tf.term, tf.doc_id, tf.tf, dfx.df, dl.dl,
                |         (CAST(44 * tf.tf * c.corpus_len AS DOUBLE)
                |            / CAST(20 * tf.tf * c.corpus_len + 6 * c.corpus_len
                |                   + 18 * dl.dl * c.n_docs AS DOUBLE))
                |         * (CAST(2 * c.n_docs - 2 * dfx.df + 1 AS DOUBLE)
                |            / CAST(2 * dfx.df + 1 AS DOUBLE)) AS score
                |  FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus c),
                |ranked AS (
                |  SELECT *, ROW_NUMBER() OVER (PARTITION BY term
                |                               ORDER BY score DESC, doc_id) AS rank
                |  FROM scored)
                |SELECT term, CAST(rank AS INT) AS rank, doc_id, tf, df, dl, score
                |FROM ranked WHERE rank <= 5 ORDER BY term, rank""".stripMargin


  private def hitsSql(words: Seq[String]): String = {
    val cond = words.map(w => s"t = '$w'").mkString(" OR ")
    s"len(list_filter($toksSql, t -> $cond))"
  }

  private val scoreSql: Map[String, String] =
    TextAnalysis.stopwords.map { case (lang, words) =>
      lang -> s"(CAST(${hitsSql(words)} AS DOUBLE) / len($toksSql))"
    }.toMap

  /** DuckDB mirror of TextAnalysis.cdcChunks: window hash at position i is
    * the direct w-term sum Σ byte_{i-k}·131^k mod p — exact mod arithmetic,
    * so it equals the engine's incremental recurrence bit-for-bit; chunk
    * hashes re-run the same list_reduce as `text_rolling_hash`.
    */
  private def cdcChunksSql(w: Int, divisor: Int): String = {
    val P = 1000000007L
    val pows = Iterator.iterate(1L)(p => p * 131L % P).take(w).toSeq
    s"""WITH codes AS (
       |  SELECT doc_id, text, length(text) AS L,
       |         list_transform(range(1, length(text) + 1),
       |                        i -> ascii(substr(text, i, 1))) AS cs
       |  FROM documents),
       |raw AS (
       |  SELECT doc_id, text, L,
       |         list_filter(range($w, L + 1),
       |           i -> (list_sum(list_transform(range(0, $w),
       |                  k -> CAST(cs[CAST(i - k AS INT)] AS BIGINT)
       |                       * [${pows.mkString(", ")}][CAST(k AS INT) + 1]))
       |                 % $P) % $divisor = 0) AS rb
       |  FROM codes WHERE L > 0),
       |bs AS (
       |  SELECT doc_id, text,
       |         CASE WHEN len(rb) > 0 AND rb[-1] = L THEN rb
       |              ELSE list_append(rb, CAST(L AS BIGINT)) END AS bs
       |  FROM raw),
       |exploded AS (
       |  SELECT doc_id, text, bs, unnest(range(0, len(bs))) AS i FROM bs),
       |chunks AS (
       |  SELECT doc_id,
       |         CAST(i + 1 AS INT) AS chunk_no,
       |         CAST(CASE WHEN i = 0 THEN 1 ELSE bs[CAST(i AS INT)] + 1 END AS INT) AS start,
       |         CAST(bs[CAST(i AS INT) + 1]
       |              - CASE WHEN i = 0 THEN 1 ELSE bs[CAST(i AS INT)] + 1 END + 1 AS INT) AS chunk_len,
       |         text
       |  FROM exploded)
       |SELECT doc_id, chunk_no, start, chunk_len,
       |       list_reduce(
       |         list_prepend(CAST(0 AS BIGINT),
       |           list_transform(range(start, start + chunk_len),
       |                          j -> CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
       |         (acc, c) -> (acc * 131 + c) % $P) AS chunk_hash
       |FROM chunks ORDER BY doc_id, chunk_no""".stripMargin
  }

  /** DuckDB mirror of TextAnalysis.languageId — shared by the per-doc
    * query and the confusion matrix. */
  private lazy val langidSql: String = {
    val scores = TextAnalysis.stopwords.map { case (l, _) =>
      s"${scoreSql(l)} AS score_$l" }.mkString(",\n                     ")
    s"""WITH scored AS (
          SELECT doc_id, lang AS labeled_lang,
                 $scores
          FROM documents)
        SELECT doc_id, labeled_lang,
               CASE WHEN score_zh > score_en AND score_zh > score_de AND score_zh > score_es AND score_zh > score_fr THEN 'zh'
                    WHEN score_fr > score_en AND score_fr > score_de AND score_fr > score_es AND score_fr >= score_zh THEN 'fr'
                    WHEN score_es > score_en AND score_es > score_de AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
                    WHEN score_de > score_en AND score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
                    ELSE 'en' END AS predicted_lang,
               score_en, score_de, score_es, score_fr, score_zh
        FROM scored ORDER BY doc_id"""
  }

  val all: Seq[GQuery] = Seq(

    GQuery("text_token_stats",
      (s, dir) => TextAnalysis.tokenStats(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
                     CAST(length(text) AS INT) AS n_chars,
                     CAST(len($toksSql) AS INT) AS n_tokens,
                     CAST(len(list_distinct($toksSql)) AS INT) AS n_types,
                     CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql) AS type_token_ratio,
                     CAST(length(text) - len($toksSql) + 1 AS DOUBLE) / len($toksSql) AS mean_token_len
              FROM documents ORDER BY doc_id"""),
      doc = "token counting: whitespace tokens, types, TTR, mean length"),

    GQuery("text_langid",
      (s, dir) => TextAnalysis.languageId(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(langidSql),
      doc = "stopword-ratio language heuristic with deterministic argmax"),

    // ---- Language-ID confusion matrix: the classifier-QA table — which
    // labeled languages the stopword heuristic mistakes for which (the
    // number that decides whether the heuristic is good enough to gate a
    // mixture, or needs the n-gram upgrade). Composes the proven per-doc
    // langid; integer counts.
    GQuery("text_langid_confusion",
      (s, dir) => TextAnalysis.languageId(Tables.documents(s, dir))
        .groupBy(col("labeled_lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("labeled_lang"), col("predicted_lang")),
      Some(s"""WITH p AS ($langidSql)
              |SELECT labeled_lang, predicted_lang, count(*) AS n_docs
              |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "language-ID confusion matrix: labeled x predicted doc counts " +
        "over the stopword heuristic — the gate-or-upgrade QA table"),

    GQuery("text_quality",
      (s, dir) => TextAnalysis.qualityScore(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
                     CAST(length(text) AS INT) AS n_chars,
                     CAST(len($toksSql) AS INT) AS n_tokens,
                     CAST(len(list_distinct($toksSql)) AS INT) AS n_types,
                     CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql) AS type_token_ratio,
                     CAST(length(text) - len($toksSql) + 1 AS DOUBLE) / len($toksSql) AS mean_token_len,
                     ${scoreSql("en")} AS stopword_ratio,
                     (len($toksSql) >= 20
                      AND CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql) >= 0.3
                      AND CAST(length(text) - len($toksSql) + 1 AS DOUBLE) / len($toksSql) BETWEEN 2.0 AND 12.0)
                       AS is_quality
              FROM documents ORDER BY doc_id"""),
      doc = "document quality signals + composite flag"),

    // ---- Model-inference shape: per-token vote table LEARNED from the
    // corpus (qualityScore as weak-supervision teacher), applied by summing
    // token votes per doc — the CCNet/fastText quality-filter pattern with
    // integer cross-multiplied rate comparisons so train+apply are
    // bit-exact cross-engine.
    GQuery("text_quality_model",
      (s, dir) => TextAnalysis.qualityVoteClassifier(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""WITH labels AS (
                 SELECT doc_id,
                        (len($toksSql) >= 20
                         AND CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql) >= 0.3
                         AND CAST(length(text) - len($toksSql) + 1 AS DOUBLE) / len($toksSql)
                             BETWEEN 2.0 AND 12.0) AS is_quality
                 FROM documents),
               toks AS (
                 SELECT doc_id, unnest($toksSql) AS token FROM documents),
               lt AS (
                 SELECT t.doc_id, t.token, l.is_quality
                 FROM toks t JOIN labels l USING (doc_id)),
               tv AS (
                 SELECT token,
                        count(*) FILTER (WHERE is_quality) AS n_q,
                        count(*) FILTER (WHERE NOT is_quality) AS n_j
                 FROM lt GROUP BY token),
               tot AS (
                 SELECT CAST(sum(n_q) AS BIGINT) AS t_q,
                        CAST(sum(n_j) AS BIGINT) AS t_j FROM tv),
               votes AS (
                 SELECT token,
                        CASE WHEN n_q * t_j > n_j * t_q THEN 1
                             WHEN n_q * t_j < n_j * t_q THEN -1
                             ELSE 0 END AS vote
                 FROM tv, tot),
               scores AS (
                 SELECT doc_id, count(*) AS n_tokens_scored,
                        CAST(sum(vote) AS BIGINT) AS vote_score
                 FROM lt JOIN votes USING (token) GROUP BY doc_id)
              SELECT s.doc_id, s.n_tokens_scored, s.vote_score,
                     s.vote_score > 0 AS predicted_quality, l.is_quality
              FROM scores s JOIN labels l USING (doc_id)
              ORDER BY s.doc_id"""),
      doc = "corpus-trained token-vote quality classifier (weak-supervision " +
        "train + inference, integer-exact)"),

    GQuery("text_fingerprint",
      (s, dir) => TextAnalysis.fingerprint(Tables.documents(s, dir))
        .groupBy(col("fingerprint"))
        .agg(min(col("doc_id")).as("canonical_doc"), count(lit(1)).as("n_docs"))
        .orderBy(col("fingerprint")),
      Some(s"""SELECT md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fingerprint,
                     min(doc_id) AS canonical_doc,
                     count(*) AS n_docs
              FROM documents
              GROUP BY fingerprint ORDER BY fingerprint"""),
      doc = "order-insensitive token-set fingerprint; collisions = near-copies"),

    GQuery("text_normalize",
      (s, dir) => {
        // the corpus is already clean, so mess it up DETERMINISTICALLY on
        // both sides (uppercased prefix, doubled spaces, trailing blank) —
        // the normalizer must undo exactly that. NFC is the identity on
        // ASCII, so the oracle mirrors lower+collapse+trim only; the
        // non-ASCII composition path is pinned by TextAnalysisSpec.
        val messy = Tables.documents(s, dir).select(col("doc_id"),
          concat(upper(substring(col("text"), 1, 10)), lit("  "),
            col("text"), lit(" ")).as("text"))
        graft.ops.TextAnalysis.withNormalizedText(messy)
          .select(col("doc_id"), length(col("text")).cast("long").as("raw_len"),
            length(col("norm_text")).cast("long").as("norm_len"),
            md5(col("norm_text")).as("norm_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH messy AS (SELECT doc_id,
                     concat(upper(substr(text, 1, 10)), '  ', text, ' ') AS text
              FROM documents),
                   n AS (SELECT doc_id, length(text) AS raw_len,
                                trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
                         FROM messy)
              SELECT doc_id, raw_len, length(nt) AS norm_len, md5(nt) AS norm_md5
              FROM n ORDER BY doc_id"""),
      doc = "canonical normalization (NFC + casefold + whitespace collapse + trim) " +
        "undoing a deterministic mess-up; native codegen'd NFC expression"),

    GQuery("text_regex_tokens",
      (s, dir) => TextAnalysis.regexTokenStats(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
                     CAST(len($toksSql) AS INT) AS n_ws_tokens,
                     CAST(len(regexp_extract_all(text, '${TextAnalysis.regexTokenPattern}')) AS INT) AS n_re_tokens
              FROM documents ORDER BY doc_id"""),
      doc = "BPE-ish regex token counting alongside whitespace tokens"),

    GQuery("text_rolling_hash",
      (s, dir) => TextAnalysis.rollingFingerprint(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                     list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform(range(1, length(text) + 1),
                                        i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
                       (acc, c) -> (acc * 131 + c) % 1000000007) AS rhash
              FROM documents ORDER BY doc_id"""),
      doc = "Rabin-Karp rolling-hash fingerprint (position-sensitive)"),

    GQuery("text_cdc_chunks",
      (s, dir) => TextAnalysis.cdcChunks(Tables.documents(s, dir), w = 16, divisor = 64)
        .orderBy(col("doc_id"), col("chunk_no")),
      Some(cdcChunksSql(w = 16, divisor = 64)),
      doc = "content-defined chunking: rolling-hash-mask boundaries + per-chunk Rabin-Karp fingerprint"),

    GQuery("split_train_val",
      (s, dir) => TextAnalysis.withSplit(Tables.documents(s, dir), valPct = 5, testPct = 5)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("total_tokens"))
        .orderBy(col("split")),
      // CAST the SUM back to BIGINT: DuckDB's sum over integer inputs
      // returns HUGEINT (int128), whose client-side rendering is
      // engine-version-dependent — the round-2 driver hash mismatch on this
      // query (and curate_corpus, the only two oracles that emitted a bare
      // integer SUM) while the local mirror passed. BIGINT output is stable
      // in every DuckDB version and matches Spark's sum(bigint) exactly.
      Some(s"""SELECT CASE WHEN b < 5 THEN 'val' WHEN b < 10 THEN 'test'
                           ELSE 'train' END AS split,
                     count(*) AS n_docs,
                     CAST(SUM(CAST(len($toksSql) AS BIGINT)) AS BIGINT) AS total_tokens
              FROM (SELECT text,
                           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100 AS b
                    FROM documents)
              GROUP BY 1 ORDER BY 1"""),
      doc = "deterministic md5-bucket train/val/test split (stable under reruns and corpus growth)"),

    GQuery("dedup_cdc_overlap",
      (s, dir) => graft.ops.Dedup.cdcOverlapPairs(Tables.documents(s, dir),
          minShared = 2, maxDf = 100)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH allc AS (SELECT * FROM (${cdcChunksSql(w = 16, divisor = 64)}) t),
              |d AS (SELECT DISTINCT doc_id, chunk_hash FROM allc),
              |keep AS (SELECT chunk_hash FROM d GROUP BY chunk_hash HAVING count(*) <= 100),
              |dd AS (SELECT d.doc_id, d.chunk_hash FROM d JOIN keep USING (chunk_hash)),
              |pairs AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_chunks
              |  FROM dd a JOIN dd b
              |    ON a.chunk_hash = b.chunk_hash AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT doc_a, doc_b, shared_chunks FROM pairs
              |WHERE shared_chunks >= 2 ORDER BY doc_a, doc_b""".stripMargin),
      doc = "chunk-level near-dup pairs: shared CDC fingerprints with a hot-chunk document-frequency cap"),

    // ---- Exact-substring duplication at the anchor grain (Lee et al. 2022):
    // content-defined anchor positions (window hash % d == 0, the CDC
    // condition WITHOUT the forced final boundary) index ~1/d of each doc's
    // L-grams; shared anchored grams across docs = copied text. The oracle
    // recomputes the same window hashes as a direct w-term sum (the
    // text_cdc_chunks mirror convention).
    GQuery("dedup_substring_anchors",
      (s, dir) => graft.ops.Dedup.substringAnchorCensus(
          Tables.documents(s, dir), L = 48, d = 8)
        .orderBy(col("doc_id")),
      Some {
        val P = 1000000007L
        val w = 48
        val pows = Iterator.iterate(1L)(p => p * 131L % P).take(w).toSeq
        s"""WITH codes AS (
           |  SELECT doc_id, text, length(text) AS L,
           |         list_transform(range(1, length(text) + 1),
           |                        i -> ascii(substr(text, i, 1))) AS cs
           |  FROM documents),
           |anchors AS (
           |  SELECT doc_id, text,
           |         list_filter(range($w, L + 1),
           |           i -> (list_sum(list_transform(range(0, $w),
           |                  k -> CAST(cs[CAST(i - k AS INT)] AS BIGINT)
           |                       * [${pows.mkString(", ")}][CAST(k AS INT) + 1]))
           |                 % $P) % 8 = 0) AS ap
           |  FROM codes WHERE L > 0),
           |grams AS (
           |  SELECT doc_id,
           |         unnest(list_distinct(list_transform(ap,
           |           i -> md5(substr(text, CAST(i AS INT) - ${w - 1}, $w))))) AS g
           |  FROM anchors),
           |freq AS (SELECT g, count(*) AS n_docs FROM grams GROUP BY g),
           |census AS (
           |  SELECT doc_id, count(*) AS n_grams,
           |         count(*) FILTER (WHERE n_docs > 1) AS n_shared
           |  FROM grams JOIN freq USING (g) GROUP BY doc_id)
           |SELECT doc_id, n_grams, n_shared,
           |       CAST(n_shared AS DOUBLE) / n_grams AS dup_fraction
           |FROM census ORDER BY doc_id""".stripMargin
      },
      doc = "exact-substring duplication census via content-defined anchored " +
        "48-grams (1/8 index of the full posting; no pair enumeration)"),

    // ---- The GUARANTEED variant: winnowing (Schleimer et al. / MOSS) —
    // argmin of every 8-window of 48-gram hashes, so any shared substring
    // of length >= 55 code points provably yields a shared anchored gram
    // in both docs (the mod-anchor scheme above is guarantee-free).
    GQuery("dedup_winnow_census",
      (s, dir) => graft.ops.Dedup.winnowedAnchorCensus(
          Tables.documents(s, dir), L = 48, W = 8)
        .orderBy(col("doc_id")),
      Some {
        val P = 1000000007L
        val w = 48; val W = 8
        val pows = Iterator.iterate(1L)(p => p * 131L % P).take(w).toSeq
        s"""WITH codes AS (
           |  SELECT doc_id, text, length(text) AS L,
           |         list_transform(range(1, length(text) + 1),
           |                        i -> ascii(substr(text, i, 1))) AS cs
           |  FROM documents),
           |hs AS (
           |  SELECT doc_id, text,
           |         list_transform(range($w, L + 1),
           |           i -> list_sum(list_transform(range(0, $w),
           |                  k -> CAST(cs[CAST(i - k AS INT)] AS BIGINT)
           |                       * [${pows.mkString(", ")}][CAST(k AS INT) + 1]))
           |                % $P) AS h
           |  FROM codes WHERE L >= $w + $W - 1),
           |sel AS (
           |  SELECT doc_id, text,
           |         list_distinct(list_transform(range(1, len(h) - $W + 2),
           |           a -> a + list_position(list_slice(h, a, a + $W - 1),
           |                                  list_min(list_slice(h, a, a + $W - 1))) - 1)) AS ps
           |  FROM hs),
           |grams AS (
           |  SELECT doc_id,
           |         unnest(list_distinct(list_transform(ps,
           |           p -> md5(substr(text, CAST(p AS INT), $w))))) AS g
           |  FROM sel),
           |freq AS (SELECT g, count(*) AS n_docs FROM grams GROUP BY g),
           |census AS (
           |  SELECT doc_id, count(*) AS n_grams,
           |         count(*) FILTER (WHERE n_docs > 1) AS n_shared
           |  FROM grams JOIN freq USING (g) GROUP BY doc_id)
           |SELECT doc_id, n_grams, n_shared,
           |       CAST(n_shared AS DOUBLE) / n_grams AS dup_fraction
           |FROM census ORDER BY doc_id""".stripMargin
      },
      doc = "winnowed exact-substring census: argmin-per-8-window anchor " +
        "selection GUARANTEES any shared run >= 55 code points is detected"),

    // ---- The census's DELIVERABLE (Lee et al. 2022): CUT every witnessed
    // cross-doc shared span (merged where overlapping/adjacent) from every
    // document holding it and emit the cleaned corpus, pinned by
    // md5+length. The oracle recomputes the winnow selection with the
    // dedup_winnow_census mirror, then mirrors the island-merge/segment
    // reassembly with window functions + ordered string_agg.
    GQuery("dedup_substring_cut",
      (s, dir) => graft.ops.Dedup.substringSpanCut(
          Tables.documents(s, dir), L = 48, W = 8)
        .orderBy(col("doc_id")),
      Some {
        val P = 1000000007L
        val w = 48; val W = 8
        val pows = Iterator.iterate(1L)(p => p * 131L % P).take(w).toSeq
        s"""WITH codes AS (
           |  SELECT doc_id, text, length(text) AS L,
           |         list_transform(range(1, length(text) + 1),
           |                        i -> ascii(substr(text, i, 1))) AS cs
           |  FROM documents),
           |hs AS (
           |  SELECT doc_id, text,
           |         list_transform(range($w, L + 1),
           |           i -> list_sum(list_transform(range(0, $w),
           |                  k -> CAST(cs[CAST(i - k AS INT)] AS BIGINT)
           |                       * [${pows.mkString(", ")}][CAST(k AS INT) + 1]))
           |                % $P) AS h
           |  FROM codes WHERE L >= $w + $W - 1),
           |sel AS (
           |  SELECT doc_id, text,
           |         list_distinct(list_transform(range(1, len(h) - $W + 2),
           |           a -> a + list_position(list_slice(h, a, a + $W - 1),
           |                                  list_min(list_slice(h, a, a + $W - 1))) - 1)) AS ps
           |  FROM hs),
           |grams AS (
           |  SELECT doc_id, p, md5(substr(text, p, $w)) AS g
           |  FROM (SELECT doc_id, text, CAST(unnest(ps) AS INT) AS p FROM sel)),
           |freq AS (SELECT g, count(DISTINCT doc_id) AS n_docs FROM grams GROUP BY g),
           |shared AS (
           |  SELECT doc_id, p FROM grams JOIN freq USING (g) WHERE n_docs > 1),
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
           |assembled AS (
           |  SELECT p.doc_id,
           |         CAST(count(*) AS BIGINT) AS n_spans,
           |         CAST(sum(p.e - p.s + 1) AS BIGINT) AS chars_cut,
           |         string_agg(substr(d.text, p.prev_e + 1, p.s - p.prev_e - 1),
           |                    '' ORDER BY p.s)
           |           || substr(any_value(d.text), max(p.e) + 1) AS clean
           |  FROM pieces p JOIN documents d USING (doc_id)
           |  GROUP BY p.doc_id)
           |SELECT d.doc_id,
           |       COALESCE(a.n_spans, 0) AS n_spans,
           |       COALESCE(a.chars_cut, 0) AS chars_cut,
           |       CAST(length(COALESCE(a.clean, d.text)) AS INT) AS clean_len,
           |       md5(COALESCE(a.clean, d.text)) AS clean_md5
           |FROM documents d LEFT JOIN assembled a USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
      },
      doc = "span-level exact-substring dedup: cut every winnow-witnessed " +
        "cross-doc shared span (merged, cut-all) and emit the cleaned corpus " +
        "— no shared run >= 55 code points survives (SubstringCutSpec)"),

    // ---- keep-one variant: the gram's minimum-doc-id holder KEEPS its
    // span; every other holder cuts — the curation default (retain one
    // copy of the boilerplate, delete the rest). Oracle = the cut-all
    // mirror plus min_doc per gram and the canonical-holder filter.
    GQuery("dedup_substring_cut_keepone",
      (s, dir) => graft.ops.Dedup.substringSpanCut(
          Tables.documents(s, dir), L = 48, W = 8, keepOne = true)
        .orderBy(col("doc_id")),
      Some {
        val P = 1000000007L
        val w = 48; val W = 8
        val pows = Iterator.iterate(1L)(p => p * 131L % P).take(w).toSeq
        s"""WITH codes AS (
           |  SELECT doc_id, text, length(text) AS L,
           |         list_transform(range(1, length(text) + 1),
           |                        i -> ascii(substr(text, i, 1))) AS cs
           |  FROM documents),
           |hs AS (
           |  SELECT doc_id, text,
           |         list_transform(range($w, L + 1),
           |           i -> list_sum(list_transform(range(0, $w),
           |                  k -> CAST(cs[CAST(i - k AS INT)] AS BIGINT)
           |                       * [${pows.mkString(", ")}][CAST(k AS INT) + 1]))
           |                % $P) AS h
           |  FROM codes WHERE L >= $w + $W - 1),
           |sel AS (
           |  SELECT doc_id, text,
           |         list_distinct(list_transform(range(1, len(h) - $W + 2),
           |           a -> a + list_position(list_slice(h, a, a + $W - 1),
           |                                  list_min(list_slice(h, a, a + $W - 1))) - 1)) AS ps
           |  FROM hs),
           |grams AS (
           |  SELECT doc_id, p, md5(substr(text, p, $w)) AS g
           |  FROM (SELECT doc_id, text, CAST(unnest(ps) AS INT) AS p FROM sel)),
           |freq AS (SELECT g, count(DISTINCT doc_id) AS n_docs,
           |                min(doc_id) AS min_doc
           |         FROM grams GROUP BY g),
           |shared AS (
           |  SELECT doc_id, p FROM grams JOIN freq USING (g)
           |  WHERE n_docs > 1 AND doc_id <> min_doc),
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
           |assembled AS (
           |  SELECT p.doc_id,
           |         CAST(count(*) AS BIGINT) AS n_spans,
           |         CAST(sum(p.e - p.s + 1) AS BIGINT) AS chars_cut,
           |         string_agg(substr(d.text, p.prev_e + 1, p.s - p.prev_e - 1),
           |                    '' ORDER BY p.s)
           |           || substr(any_value(d.text), max(p.e) + 1) AS clean
           |  FROM pieces p JOIN documents d USING (doc_id)
           |  GROUP BY p.doc_id)
           |SELECT d.doc_id,
           |       COALESCE(a.n_spans, 0) AS n_spans,
           |       COALESCE(a.chars_cut, 0) AS chars_cut,
           |       CAST(length(COALESCE(a.clean, d.text)) AS INT) AS clean_len,
           |       md5(COALESCE(a.clean, d.text)) AS clean_md5
           |FROM documents d LEFT JOIN assembled a USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
      },
      doc = "keep-one span cut: the minimum-doc-id holder keeps each witnessed " +
        "span, every other holder cuts — the corpus retains exactly one copy"),

    GQuery("text_redact_pii",
      (s, dir) => TextAnalysis.redactPii(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '${TextAnalysis.piiEmailPattern}')) AS INT) AS n_emails,
                     CAST(len(regexp_extract_all(
                       regexp_replace(text, '${TextAnalysis.piiEmailPattern}', '<PII>', 'g'),
                       '${TextAnalysis.piiLongNumberPattern}')) AS INT) AS n_long_numbers,
                     md5(regexp_replace(regexp_replace(text, '${TextAnalysis.piiEmailPattern}', '<PII>', 'g'),
                                        '${TextAnalysis.piiLongNumberPattern}', '<PII>', 'g')) AS redacted_md5
              FROM documents ORDER BY doc_id"""),
      doc = "PII scrubbing report: per-category counts + md5 of the redacted text"),

    GQuery("text_repetition",
      (s, dir) => TextAnalysis.repetitionStats(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
                   tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
                   cnt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
                   top AS (SELECT doc_id, max(c) AS top_cnt FROM cnt GROUP BY 1),
                   bg AS (SELECT doc_id, len(toks) AS n_tokens,
                                 CASE WHEN len(toks) >= 2
                                      THEN list_transform(range(1, len(toks)),
                                             i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])
                                      ELSE CAST([] AS VARCHAR[]) END AS b
                          FROM t)
              SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens,
                     CAST(top.top_cnt AS DOUBLE) / b.n_tokens AS top_token_frac,
                     CASE WHEN len(b.b) > 0
                          THEN CAST(len(b.b) - len(list_distinct(b.b)) AS DOUBLE) / len(b.b)
                          ELSE 0.0 END AS dup_bigram_frac,
                     (CAST(top.top_cnt AS DOUBLE) / b.n_tokens > 0.2 OR
                      CASE WHEN len(b.b) > 0
                           THEN CAST(len(b.b) - len(list_distinct(b.b)) AS DOUBLE) / len(b.b)
                           ELSE 0.0 END > 0.2) AS is_repetitive
              FROM bg b JOIN top ON b.doc_id = top.doc_id
              ORDER BY b.doc_id"""),
      doc = "repetition quality gate: top-token share + duplicate-bigram fraction"),

    GQuery("text_rarity",
      (s, dir) => TextAnalysis.rarityStats(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
                   freq AS (SELECT token, count(*) AS freq FROM tok GROUP BY 1)
              SELECT doc_id,
                     count(*) AS n_tokens,
                     CAST(SUM(freq) AS DOUBLE) / count(*) AS mean_token_freq,
                     min(freq) AS min_token_freq
              FROM tok JOIN freq USING (token)
              GROUP BY doc_id ORDER BY doc_id"""),
      doc = "token-rarity signals vs the corpus frequency table (log-free LM-quality stand-in)"),

    // Heavy tokens via the Misra-Gries frequent-items sketch: the bounded
    // k-counter summary prunes the unbounded vocabulary to ≤ k candidates
    // (order-independent GUARANTEE: every token with count > n/(k+1)
    // survives), then candidates are re-counted exactly and thresholded
    // with pure integer arithmetic (count·(k+1) > n) — deterministic
    // output from an order-dependent sketch, the prune-then-verify shape.
    GQuery("sketch_mg_heavy_tokens",
      (s, dir) => {
        import s.implicits._
        val k = 30
        val toks = TextAnalysis.withTokens(Tables.documents(s, dir))
          .select(explode(col("toks")).as("token"))
        val cands = toks.as[String]
          .select(graft.functions.MgAggregator.mg(k).toColumn)
          .collect().head
        val total = toks.count()
        toks.filter(col("token").isin(cands: _*))
          .groupBy(col("token")).agg(count(lit(1)).as("n_occurrences"))
          .filter(col("n_occurrences") * (k + 1) > total)
          .orderBy(col("token"))
      },
      Some(s"""WITH tok AS (SELECT unnest($toksSql) AS token FROM documents),
                   n AS (SELECT count(*) AS n FROM tok)
              SELECT token, count(*) AS n_occurrences
              FROM tok GROUP BY token
              HAVING count(*) * 31 > (SELECT n FROM n)
              ORDER BY token"""),
      doc = "Misra-Gries heavy hitters: bounded mergeable k-counter candidate sketch " +
        "+ exact recount, integer threshold count*(k+1) > n"),

    // Robust per-source length outlier fences — Tukey's 1.5×IQR over the
    // EXACT rank-selection quartiles (the agg_percentiles convention:
    // ceil(q·n), interpolation-free, partitioning-independent), so the
    // fences are exact doubles (1.5 × integer) and the census hash-compares.
    // The classic scraped-corpus gate: truncated fragments below the low
    // fence, concatenation/boilerplate blobs above the high one.
    // ---- MAD robust outliers — the rank-based sibling of the IQR fences
    // below: median absolute deviation tolerates up to 50% contamination
    // where quartile fences break down earlier. Everything integer-exact:
    // lower-median rank selection for the center, the same selection over
    // |x − med| for the MAD, and the 3×MAD flag compares integers — no
    // float constant (the usual 1.4826 normal-consistency factor is a
    // presentation scale, irrelevant to flagging).
    GQuery("text_outlier_mad",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
          .select(col("source"), col("n_chars"), col("doc_id"))
        def lowerMedian(in: org.apache.spark.sql.DataFrame, valueCol: String,
            out: String) = {
          val w = Window.partitionBy(col("source"))
            .orderBy(col(valueCol), col("doc_id"))
          val wAll = Window.partitionBy(col("source"))
          in.withColumn("rn", row_number().over(w))
            .withColumn("cnt", count(lit(1)).over(wAll))
            .filter(col("rn") === expr("CAST(ceil(cnt / 2.0) AS BIGINT)"))
            .select(col("source"), col(valueCol).as(out), col("cnt"))
        }
        val med = lowerMedian(docs, "n_chars", "med_chars")
        val withAd = docs.join(med.select(col("source"), col("med_chars")), Seq("source"))
          .withColumn("ad", abs(col("n_chars") - col("med_chars")))
        val mad = lowerMedian(withAd, "ad", "mad_chars")
        withAd.join(mad.select(col("source"), col("mad_chars")), Seq("source"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            max(col("med_chars")).as("med_chars"),
            max(col("mad_chars")).as("mad_chars"),
            count(when(col("ad") > lit(3) * col("mad_chars"), 1)).as("n_outliers"))
          .orderBy(col("source"))
      },
      Some("""WITH r AS (
                SELECT source, doc_id, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY n_chars, doc_id) AS rn,
                       COUNT(*) OVER (PARTITION BY source) AS cnt
                FROM documents),
              med AS (
                SELECT source, n_chars AS med_chars FROM r
                WHERE rn = CAST(ceil(cnt / 2.0) AS BIGINT)),
              ad AS (
                SELECT d.source, d.doc_id, abs(d.n_chars - m.med_chars) AS ad,
                       m.med_chars
                FROM documents d JOIN med m USING (source)),
              r2 AS (
                SELECT source, ad,
                       ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY ad, doc_id) AS rn,
                       COUNT(*) OVER (PARTITION BY source) AS cnt
                FROM ad),
              mad AS (
                SELECT source, ad AS mad_chars FROM r2
                WHERE rn = CAST(ceil(cnt / 2.0) AS BIGINT))
              SELECT a.source,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(max(a.med_chars) AS BIGINT) AS med_chars,
                     CAST(max(m.mad_chars) AS BIGINT) AS mad_chars,
                     CAST(count(*) FILTER (WHERE a.ad > 3 * m.mad_chars) AS BIGINT)
                       AS n_outliers
              FROM ad a JOIN mad m USING (source)
              GROUP BY a.source ORDER BY a.source"""),
      doc = "MAD robust outliers per source: integer-exact lower-median center, " +
        "MAD by the same rank selection over |x - med|, 3xMAD integer flag"),

    GQuery("text_outlier_iqr",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
        val wAll = Window.partitionBy(col("source"))
        def atQ(q: String, name: String) =
          max(when(col("rn") === expr(s"ceil($q * cnt)"), col("n_chars"))).as(name)
        val fences = Tables.documents(s, dir)
          .select(col("source"), col("n_chars"), col("doc_id"))
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(wAll))
          .groupBy(col("source"))
          .agg(atQ("0.25", "q1"), atQ("0.75", "q3"), max(col("cnt")).as("n_docs"))
          .withColumn("lo_fence",
            col("q1").cast("double") - lit(1.5) * (col("q3") - col("q1")).cast("double"))
          .withColumn("hi_fence",
            col("q3").cast("double") + lit(1.5) * (col("q3") - col("q1")).cast("double"))
        Tables.documents(s, dir).select(col("source"), col("n_chars"))
          .join(fences, Seq("source"))
          .groupBy(col("source"))
          .agg(max(col("n_docs")).as("n_docs"),
            max(col("q1")).as("q1"), max(col("q3")).as("q3"),
            max(col("lo_fence")).as("lo_fence"), max(col("hi_fence")).as("hi_fence"),
            count(when(col("n_chars") < col("lo_fence") ||
              col("n_chars") > col("hi_fence"), 1)).as("n_outliers"))
          .orderBy(col("source"))
      },
      Some("""WITH r AS (
                SELECT source, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY n_chars, doc_id) AS rn,
                       COUNT(*) OVER (PARTITION BY source) AS cnt
                FROM documents),
              q AS (
                SELECT source,
                       MAX(CASE WHEN rn = CEIL(0.25 * cnt) THEN n_chars END) AS q1,
                       MAX(CASE WHEN rn = CEIL(0.75 * cnt) THEN n_chars END) AS q3,
                       MAX(cnt) AS n_docs
                FROM r GROUP BY source),
              f AS (
                SELECT source, n_docs, q1, q3,
                       CAST(q1 AS DOUBLE) - 1.5 * CAST(q3 - q1 AS DOUBLE) AS lo_fence,
                       CAST(q3 AS DOUBLE) + 1.5 * CAST(q3 - q1 AS DOUBLE) AS hi_fence
                FROM q)
              SELECT d.source, MAX(f.n_docs) AS n_docs,
                     MAX(f.q1) AS q1, MAX(f.q3) AS q3,
                     MAX(f.lo_fence) AS lo_fence, MAX(f.hi_fence) AS hi_fence,
                     COUNT(CASE WHEN d.n_chars < f.lo_fence
                                  OR d.n_chars > f.hi_fence THEN 1 END) AS n_outliers
              FROM documents d JOIN f USING (source)
              GROUP BY d.source ORDER BY d.source"""),
      doc = "Tukey 1.5-IQR length-outlier census per source over exact rank-selection " +
        "quartiles: truncated fragments and boilerplate blobs flagged robustly"),

    GQuery("text_bigram_lm",
      (s, dir) => TextAnalysis.bigramLmStats(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
                   bi AS (SELECT doc_id,
                                 unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS bigram
                          FROM toks),
                   freq AS (SELECT bigram, count(*) AS freq FROM bi GROUP BY 1)
              SELECT doc_id,
                     count(*) AS n_bigrams,
                     CAST(SUM(freq) AS DOUBLE) / count(*) AS mean_bigram_freq,
                     min(freq) AS min_bigram_freq,
                     count(CASE WHEN freq = 1 THEN 1 END) AS n_singletons
              FROM bi JOIN freq USING (bigram)
              GROUP BY doc_id ORDER BY doc_id"""),
      doc = "2-gram corpus-likelihood proxy (KenLM-style fluency filter, model-free): " +
        "adjacent-pair transition frequencies vs the corpus — catches unnatural " +
        "sequences whose tokens are individually common"),

    // ---- CCNet-style quality terciles: each language's documents ranked
    // by the bigram-LM fluency proxy and cut into head/middle/tail — the
    // bucketing CCNet ships (train on head, audit tail). Exact integer
    // tercile arithmetic ((3·(r−1)) div n over a lang-PARTITIONED rank —
    // never an unpartitioned window), deterministic (score, doc_id) ties.
    GQuery("text_ccnet_buckets",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val scored = TextAnalysis.bigramLmStats(docs)
          .select(col("doc_id"), col("n_bigrams"), col("mean_bigram_freq"))
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("mean_bigram_freq").desc, col("doc_id"))
        val n = Window.partitionBy(col("lang"))
        scored
          .withColumn("r", row_number().over(w))
          .withColumn("nl", count(lit(1)).over(n))
          .withColumn("bucket", expr(
            "CASE (3 * (r - 1)) div nl WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END"))
          .groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_bigrams")).cast("long").as("n_bigrams"),
            min(col("mean_bigram_freq")).as("min_score"),
            max(col("mean_bigram_freq")).as("max_score"))
          .orderBy(col("lang").asc_nulls_first, col("bucket"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
               bi AS (SELECT doc_id,
                             unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i+1])) AS bigram
                      FROM toks),
               freq AS (SELECT bigram, count(*) AS freq FROM bi GROUP BY 1),
               sc AS (SELECT doc_id, count(*) AS n_bigrams,
                             CAST(SUM(freq) AS DOUBLE) / count(*) AS score
                      FROM bi JOIN freq USING (bigram) GROUP BY doc_id),
               ranked AS (
                 SELECT d.lang, s.n_bigrams, s.score,
                        ROW_NUMBER() OVER (PARTITION BY d.lang
                          ORDER BY s.score DESC, s.doc_id) AS r,
                        COUNT(*) OVER (PARTITION BY d.lang) AS nl
                 FROM sc s JOIN documents d USING (doc_id)),
               b AS (
                 SELECT lang, n_bigrams, score,
                        CASE (3 * (r - 1)) // nl WHEN 0 THEN 'head'
                             WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
                 FROM ranked)
               SELECT lang, bucket, count(*) AS n_docs,
                      CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
                      MIN(score) AS min_score, MAX(score) AS max_score
               FROM b GROUP BY 1, 2 ORDER BY lang NULLS FIRST, bucket"""),
      doc = "CCNet head/middle/tail quality terciles per language over the " +
        "bigram-LM fluency score: exact integer tercile cut, per-bucket " +
        "census — train-on-head / audit-tail bucketing"),

    GQuery("text_tfidf_top_terms",
      (s, dir) => TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), topN = 3)
        .orderBy(col("doc_id"), col("rank")),
      Some(s"""WITH tf AS (
              |  SELECT doc_id, t.term, count(*) AS tf
              |  FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents) t
              |  GROUP BY doc_id, t.term),
              |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              |n AS (SELECT count(*) AS n FROM documents),
              |scored AS (
              |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
              |         CAST(tf.tf AS DOUBLE) * (SELECT n FROM n) / df.df AS score,
              |         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
              |                            ORDER BY CAST(tf.tf AS DOUBLE) * (SELECT n FROM n) / df.df DESC,
              |                                     tf.term) AS rank
              |  FROM tf JOIN df USING (term))
              |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, score
              |FROM scored WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin),
      doc = "log-free TF-IDF keyword extraction: top-3 terms per document by " +
        "tf x N / df (raw idf preserves every ranking, stays IEEE-deterministic)"),

    // ---- Dataset card: the one-query corpus summary a dataset release
    // ships (docs/tokens/chars, language and source breadth, exact-dup
    // content ratio, median length) — every number an exact integer, the
    // median via the bounded per-value histogram (never a corpus-wide
    // window), stacked to (metric, value) rows.
    GQuery("curate_dataset_card",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables.documents(s, dir).select(
          col("lang"), col("source"), col("text"),
          size(split(col("text"), " ")).cast("long").as("nt"),
          length(col("text")).cast("long").as("nc"))
        val base = t.agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("n_tokens"), sum(col("nc")).as("n_chars"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(md5(col("text"))).as("n_unique_texts"))
        val hist = t.groupBy(col("nt")).agg(count(lit(1)).as("c"))
        val cum = hist.withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("nt"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val med = cum.crossJoin(broadcast(base.select(col("n_docs").as("nd"))))
          .filter(col("cum") >= expr("(nd + 1) div 2"))
          .agg(min(col("nt")).as("median_tokens"))
        // card_script_mix / card_sentence_length composed down to the two
        // corpus-wide governance scalars the card quotes
        val script = t.agg(expr(
          "sum(CAST(length(regexp_replace(text, '[^a-z]', '')) AS BIGINT)) * 10000" +
            " div sum(nc)").as("script_lower_e4"))
        val sent = Tables.documents(s, dir)
          .select(explode(split(col("text"), "\\. ")).as("sent"))
          .agg(expr("CAST(sum(size(split(sent, ' '))) AS BIGINT) * 100 div count(1)")
            .as("sent_tokens_e2"))
        base.crossJoin(med).crossJoin(script).crossJoin(sent).select(expr(
          "stack(9, 'n_docs', n_docs, 'n_tokens', n_tokens, " +
            "'n_chars', n_chars, 'n_langs', n_langs, 'n_sources', n_sources, " +
            "'n_unique_texts', n_unique_texts, 'median_tokens', median_tokens, " +
            "'script_lower_e4', script_lower_e4, 'sent_tokens_e2', sent_tokens_e2) " +
            "AS (metric, value)"))
          .orderBy(col("metric"))
      },
      Some("""WITH t AS (
                SELECT lang, source, text,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
                FROM documents),
              base AS (
                SELECT count(*) AS n_docs,
                       CAST(SUM(nt) AS BIGINT) AS n_tokens,
                       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
                       count(DISTINCT lang) AS n_langs,
                       count(DISTINCT source) AS n_sources,
                       count(DISTINCT md5(text)) AS n_unique_texts
                FROM t),
              h AS (SELECT nt, count(*) AS c FROM t GROUP BY nt),
              cum AS (SELECT nt, SUM(c) OVER (ORDER BY nt ROWS UNBOUNDED PRECEDING) AS cum
                      FROM h),
              med AS (SELECT CAST(min(nt) AS BIGINT) AS median_tokens
                      FROM cum, base WHERE cum >= (n_docs + 1) // 2),
              scr AS (SELECT CAST(SUM(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)) AS BIGINT)
                               * 10000 // CAST(SUM(length(text)) AS BIGINT) AS script_lower_e4
                      FROM documents),
              snt AS (SELECT CAST(SUM(len(string_split(sent, ' '))) AS BIGINT) * 100
                               // count(*) AS sent_tokens_e2
                      FROM (SELECT unnest(string_split(text, '. ')) AS sent FROM documents))
              SELECT metric, value FROM (
                SELECT 'n_docs' AS metric, n_docs AS value FROM base
                UNION ALL SELECT 'n_tokens', n_tokens FROM base
                UNION ALL SELECT 'n_chars', n_chars FROM base
                UNION ALL SELECT 'n_langs', n_langs FROM base
                UNION ALL SELECT 'n_sources', n_sources FROM base
                UNION ALL SELECT 'n_unique_texts', n_unique_texts FROM base
                UNION ALL SELECT 'median_tokens', median_tokens FROM med
                UNION ALL SELECT 'script_lower_e4', script_lower_e4 FROM scr
                UNION ALL SELECT 'sent_tokens_e2', sent_tokens_e2 FROM snt)
              ORDER BY metric"""),
      doc = "dataset card: exact corpus summary (counts, breadth, dup ratio, " +
        "histogram-derived median length, script purity, mean sentence " +
        "length) as (metric, value) rows"),

    // ---- Script-mix census per language — the Unicode-block governance
    // table: character-class counts (lowercase Latin letters, digits,
    // spaces, other) per labeled language, with script purity at 1e4
    // scale. Pure column math per doc (regexp class strips + length
    // algebra, zero shuffles before the |langs|-row groupBy); at 100 TB
    // the classes extend to real Unicode blocks the same way — one
    // regexp strip per block, still scan-local.
    GQuery("card_script_mix",
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"),
          length(col("text")).cast("long").as("nc"),
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("nl"),
          length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("nd"),
          (length(col("text")) - length(regexp_replace(col("text"), " ", "")))
            .cast("long").as("ns"))
        .groupBy(col("lang"))
        .agg(sum(col("nc")).as("n_chars"), sum(col("nl")).as("n_lower"),
          sum(col("nd")).as("n_digit"), sum(col("ns")).as("n_space"),
          (sum(col("nc")) - sum(col("nl")) - sum(col("nd")) - sum(col("ns")))
            .as("n_other"),
          expr("sum(nl) * 10000 div sum(nc)").as("lower_e4"))
        .orderBy(col("lang").asc_nulls_first),
      Some("""WITH c AS (
                SELECT lang,
                       CAST(length(text) AS BIGINT) AS nc,
                       CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS nl,
                       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS nd,
                       CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS ns
                FROM documents)
              SELECT lang,
                     CAST(SUM(nc) AS BIGINT) AS n_chars,
                     CAST(SUM(nl) AS BIGINT) AS n_lower,
                     CAST(SUM(nd) AS BIGINT) AS n_digit,
                     CAST(SUM(ns) AS BIGINT) AS n_space,
                     CAST(SUM(nc) - SUM(nl) - SUM(nd) - SUM(ns) AS BIGINT) AS n_other,
                     CAST(SUM(nl) AS BIGINT) * 10000 // CAST(SUM(nc) AS BIGINT) AS lower_e4
              FROM c GROUP BY lang ORDER BY lang NULLS FIRST"""),
      doc = "script-mix census per language: character-class counts + script " +
        "purity at 1e4 — the Unicode-block governance table of the dataset card"),

    // ---- Sentence-length census per language — text_sentence_stats
    // re-aggregated to the language grain with exact integer rationals:
    // which languages run long sentences (packing/window sizing input).
    GQuery("card_sentence_length",
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"), explode(split(col("text"), "\\. ")).as("sent"))
        .select(col("lang"),
          expr("CAST(size(split(sent, ' ')) AS BIGINT)").as("st"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sentences"),
          sum(col("st")).as("total_tokens"),
          max(col("st")).as("max_sent_tokens"),
          expr("sum(st) * 100 div count(1)").as("mean_tokens_e2"))
        .orderBy(col("lang").asc_nulls_first),
      Some("""WITH s AS (
                SELECT lang, CAST(len(string_split(sent, ' ')) AS BIGINT) AS st
                FROM (SELECT lang, unnest(string_split(text, '. ')) AS sent
                      FROM documents))
              SELECT lang, count(*) AS n_sentences,
                     CAST(SUM(st) AS BIGINT) AS total_tokens,
                     CAST(MAX(st) AS BIGINT) AS max_sent_tokens,
                     CAST(SUM(st) AS BIGINT) * 100 // count(*) AS mean_tokens_e2
              FROM s GROUP BY lang ORDER BY lang NULLS FIRST"""),
      doc = "sentence-length census per language: sentence counts, token " +
        "totals, longest sentence, exact 1e2 mean — packing/window input"),

    // ---- BM25 keyword retrieval: the inverted-index ranking function,
    // k1/b re-derived as exact integer rationals (three correctly-rounded
    // IEEE ops, operands < 2^53) so the cross-engine ranking is
    // hash-exact. The filtered explode IS the posting-list scan for the
    // bounded query-term set — no full-vocabulary index materialized.
    GQuery("text_bm25_search",
      (s, dir) => TextAnalysis.bm25TopK(Tables.documents(s, dir),
        Seq("spark", "join", "stream", "filter"), topN = 5)
        .orderBy(col("term"), col("rank")),
      Some(bm25Sql),
      doc = "BM25 top-5 retrieval per query term (k1=1.2, b=0.75 as exact " +
        "integer rationals; posting-list tf via filtered explode; " +
        "IEEE-deterministic score)"),

    // ---- Raw-TF·IDF retrieval: the hybrid's second ranker served
    // standalone — the SAME tfidfScoreSql definition text_hybrid_rrf
    // fuses, so a retune cannot silently diverge the two. Log-free raw
    // idf keeps the score one IEEE-exact division (libm log differs
    // across engines).
    GQuery("text_tfidf_search",
      (s, dir) => TextAnalysis.tfidfTopK(Tables.documents(s, dir),
        Seq("spark", "join", "stream", "filter"), topN = 5)
        .orderBy(col("term"), col("rank")),
      Some(s"""WITH tf AS (
              |  SELECT doc_id, t.term, count(*) AS tf
              |  FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents) t
              |  WHERE t.term IN ('spark', 'join', 'stream', 'filter')
              |  GROUP BY doc_id, t.term),
              |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              |corpus AS (SELECT count(*) AS n_docs FROM documents)
              |SELECT term, CAST(rank AS INT) AS rank, doc_id, score FROM (
              |  SELECT tf.term, tf.doc_id,
              |         CAST(tf.tf * c.n_docs AS DOUBLE) / CAST(dfx.df AS DOUBLE) AS score,
              |         ROW_NUMBER() OVER (PARTITION BY tf.term ORDER BY
              |           CAST(tf.tf * c.n_docs AS DOUBLE) / CAST(dfx.df AS DOUBLE)
              |             DESC, tf.doc_id) AS rank
              |  FROM tf JOIN dfx USING (term) CROSS JOIN corpus c)
              |WHERE rank <= 5 ORDER BY term, rank""".stripMargin),
      doc = "raw-TF-IDF top-5 retrieval per query term (score = tf*N/df, " +
        "log-free so IEEE-exact; the standalone form of the hybrid's " +
        "second ranker)"),

    // ---- Hybrid retrieval by reciprocal-rank fusion: BM25's
    // length-normalized ranking fused with raw TF·IDF's via exact
    // Σ ⌊1e6/(60+rank)⌋ — the standard heterogeneous-retriever merge
    // (Cormack's RRF), with per-side provenance flags. Integer fusion →
    // bit-stable final ranking.
    GQuery("text_hybrid_rrf",
      (s, dir) => TextAnalysis.hybridRrfTopK(Tables.documents(s, dir),
          Seq("spark", "join", "stream", "filter"), perRanker = 10, topN = 5)
        .orderBy(col("term"), col("rank")),
      Some(s"""WITH dl AS (
              |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl FROM documents),
              |corpus AS (
              |  SELECT count(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS corpus_len FROM dl),
              |tf AS MATERIALIZED (
              |  SELECT doc_id, t.term, count(*) AS tf
              |  FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents) t
              |  WHERE t.term IN ('spark', 'join', 'stream', 'filter')
              |  GROUP BY doc_id, t.term),
              |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              |bm AS MATERIALIZED (
              |  SELECT term, doc_id, rank AS rank_bm25 FROM (
              |    SELECT tf.term, tf.doc_id,
              |           ROW_NUMBER() OVER (PARTITION BY tf.term ORDER BY
              |             (CAST(44 * tf.tf * c.corpus_len AS DOUBLE)
              |                / CAST(20 * tf.tf * c.corpus_len + 6 * c.corpus_len
              |                       + 18 * dl.dl * c.n_docs AS DOUBLE))
              |             * (CAST(2 * c.n_docs - 2 * dfx.df + 1 AS DOUBLE)
              |                / CAST(2 * dfx.df + 1 AS DOUBLE)) DESC, tf.doc_id) AS rank
              |    FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus c)
              |  WHERE rank <= 10),
              |ti AS MATERIALIZED (
              |  SELECT term, doc_id, rank AS rank_tfidf FROM (
              |    SELECT tf.term, tf.doc_id,
              |           ROW_NUMBER() OVER (PARTITION BY tf.term ORDER BY
              |             CAST(tf.tf * c.n_docs AS DOUBLE) / CAST(dfx.df AS DOUBLE)
              |               DESC, tf.doc_id) AS rank
              |    FROM tf JOIN dfx USING (term) CROSS JOIN corpus c)
              |  WHERE rank <= 10),
              |fused AS (
              |  SELECT term, doc_id,
              |         COALESCE(1000000 // (60 + rank_bm25), 0)
              |           + COALESCE(1000000 // (60 + rank_tfidf), 0) AS rrf_e6,
              |         CASE WHEN rank_bm25 IS NULL THEN 0 ELSE 1 END AS in_bm25,
              |         CASE WHEN rank_tfidf IS NULL THEN 0 ELSE 1 END AS in_tfidf
              |  FROM bm FULL JOIN ti USING (term, doc_id))
              |SELECT term, CAST(rank AS INT) AS rank, doc_id,
              |       CAST(rrf_e6 AS BIGINT) AS rrf_e6, in_bm25, in_tfidf
              |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY term
              |                                   ORDER BY rrf_e6 DESC, doc_id) AS rank
              |      FROM fused)
              |WHERE rank <= 5 ORDER BY term, rank""".stripMargin),
      doc = "hybrid retrieval: BM25 + raw-TF-IDF rankings fused by exact " +
        "integer RRF (sum of 1e6 div (60+rank)), per-side provenance flags, " +
        "bit-stable fused ranking"),

    // ---- Persisted inverted-index lifecycle: postings + doc-length
    // sidecar as versioned MergeTables, built from half the corpus and
    // incrementally UPSERTED with the other half (delta-sized, idempotent
    // on replay), then BM25 search served ENTIRELY from the tables — must
    // equal the direct-scan bm25 oracle over the whole corpus. The text
    // sibling of sim_ivf_index_incremental.
    GQuery("text_index_search_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val postings = graft.stages.MergeTable.scratch(Seq("term", "doc_id"))
        val stats = graft.stages.MergeTable.scratch(Seq("doc_id"))
        TextAnalysis.invertedIndexBuild(
          docs.filter(col("doc_id") % 2 === 0), postings, stats)
        TextAnalysis.invertedIndexAdd(
          docs.filter(col("doc_id") % 2 === 1), postings, stats)
        TextAnalysis.invertedIndexSearch(s, postings, stats,
          Seq("spark", "join", "stream", "filter"), topN = 5)
          .orderBy(col("term"), col("rank"))
      },
      Some(bm25Sql),
      doc = "inverted index as versioned MergeTables (build + incremental " +
        "add + served BM25 search) == direct-scan oracle over the full corpus"),

    GQuery("text_bpe_pairs",
      (s, dir) => TextAnalysis.bpePairCensus(Tables.documents(s, dir), topN = 30)
        .orderBy(col("freq").desc, col("pair")),
      Some(s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
              |bg AS (
              |  SELECT unnest(CASE WHEN len(toks) >= 2
              |                     THEN list_transform(range(1, len(toks)),
              |                            i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])
              |                     ELSE CAST([] AS VARCHAR[]) END) AS pair
              |  FROM t)
              |SELECT pair, count(*) AS freq FROM bg
              |GROUP BY pair ORDER BY freq DESC, pair LIMIT 30""".stripMargin),
      doc = "BPE vocabulary training's distributed core: corpus-wide adjacent-pair " +
        "census, top-30 merge candidates with deterministic tie-break"),

    // ---- The full BPE training LOOP over the distinct-word vocab table
    // (bounded rounds, localCheckpoint cuts, native greedy merge kernel)
    // and the trained tokenizer applied corpus-wide. The oracle UNROLLS
    // the rounds as a CTE chain; its merge application is the island/
    // parity list formulation (greedy left-to-right non-overlapping — the
    // exact BpeMerge kernel semantics, including "x x x" -> ["xx","x"]).
    GQuery("text_bpe_train",
      (s, dir) => TextAnalysis.bpeTrain(Tables.documents(s, dir), rounds = bpeRounds)._1
        .orderBy(col("round")),
      Some(bpeTrainSql),
      doc = s"BPE merge-table training: $bpeRounds rounds of weighted pair census " +
        "+ deterministic argmax + greedy merge over the distinct-word vocab " +
        "== unrolled-rounds oracle"),

    GQuery("text_bpe_apply",
      (s, dir) => {
        val (_, vocab) = TextAnalysis.bpeTrain(Tables.documents(s, dir), rounds = bpeRounds)
        TextAnalysis.bpeApply(Tables.documents(s, dir), vocab)
          .orderBy(col("doc_id"))
      },
      Some(bpeApplySql),
      doc = "trained BPE tokenizer applied corpus-wide: per-doc word/BPE-symbol/" +
        "char counts via one vocab join — compression the merge table bought"),

    GQuery("text_unigram_train",
      (s, dir) => TextAnalysis.unigramTrain(Tables.documents(s, dir))._1
        .orderBy(col("round"), col("cnt").desc, col("piece")),
      Some(uniTrainSql),
      doc = "unigram-LM (SentencePiece-style) tokenizer training: substring " +
        "seed vocab (all chars + top-20 multis), 2 hard-EM rounds of native " +
        "Viterbi segmentation + freq-weighted usage census, prune to top-12 " +
        "multis with char floor — per-round census == unrolled-DP oracle"),

    GQuery("text_unigram_apply",
      (s, dir) => {
        val (_, seg) = TextAnalysis.unigramTrain(Tables.documents(s, dir))
        TextAnalysis.unigramApply(Tables.documents(s, dir), seg)
          .orderBy(col("doc_id"))
      },
      Some(uniApplySql),
      doc = "trained unigram tokenizer applied corpus-wide: per-doc word/piece/" +
        "char counts via one word-keyed vocab join — the compression the " +
        "learned piece vocabulary bought"),

    // ---- WordPiece (greedy longest-match-first, the BERT inference
    // algorithm): the THIRD tokenizer family next to BPE's merge replay
    // and the unigram LM's Viterbi DP. The shared seed vocabulary (all
    // chars + top-20 multis) rides as a literal array; segmentation is
    // one whole-stage-codegen fold per DISTINCT word (aggregate over
    // positions, longest in-vocab piece wins, 1-char fallback), so the
    // corpus text is touched only by the word census and the per-doc
    // join. DuckDB mirrors the fold with list_reduce over [pos, np]
    // list accumulators (the acc-type == element-type convention).
    GQuery("text_wordpiece_apply",
      (s, dir) => TextAnalysis.wordpieceApply(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some(wpApplySql),
      doc = "WordPiece greedy longest-match tokenizer applied corpus-wide " +
        "(seed vocab: chars + top-20 multis): per-doc word/piece/char " +
        "counts — one codegen fold per distinct word, == the unrolled " +
        "greedy oracle"),

    // ---- Vocab-size sweep: the tokenizer family's SIZING knob (the
    // vocab_size hyperparameter every BPE/WordPiece build fixes by
    // folklore), priced like the ANN cards: arms top-5/20/40 multis are
    // LIMIT prefixes of ONE ranked sub-piece census (chars always kept
    // for coverage), each folded over the one distinct-word table —
    // exact corpus token counts + integer tokens-per-million-chars, so
    // the compression a bigger resident vocab buys is measured.
    GQuery("text_wordpiece_vocab_report",
      (s, dir) => TextAnalysis.wordpieceVocabReport(Tables.documents(s, dir),
          multisArms = Seq(5, 20, 40))
        .orderBy(col("method")),
      Some(wpVocabSql(multisArms = Seq(5, 20, 40), maxPieceLen = 4)),
      doc = "WordPiece vocab-size sweep: top-5/20/40 multi-piece arms as " +
        "prefixes of one ranked census, greedy-folded over one distinct-" +
        "word table — exact token counts and tokens-per-million-chars " +
        "per arm price the vocab_size knob"),

    // ---- Vocabulary OOV census — the generalization measurement every
    // tokenizer/vocab build needs: train the word vocabulary on HALF the
    // corpus (even doc_ids), measure out-of-vocabulary rates on the
    // held-out half, per language. One distinct-word build + one
    // word-keyed left join; oov_e4 is an exact integer rational.
    GQuery("text_oov_census",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val vocab = TextAnalysis.withTokens(docs.filter(col("doc_id") % 2 === 0))
          .select(explode(col("toks")).as("word")).distinct()
        val held = TextAnalysis.withTokens(docs.filter(col("doc_id") % 2 === 1))
          .select(col("lang"), explode(col("toks")).as("word"))
        held.join(vocab.withColumn("_in", lit(1)), Seq("word"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_words"),
            count(when(col("_in").isNull, lit(1))).as("n_oov"),
            countDistinct(col("word")).as("n_types"),
            countDistinct(when(col("_in").isNull, col("word"))).as("n_oov_types"))
          .select(col("lang"), col("n_words"), col("n_oov"),
            col("n_types"), col("n_oov_types"),
            expr("n_oov * 10000 div n_words").as("oov_e4"))
          .orderBy(col("lang").asc_nulls_first)
      },
      Some(s"""WITH vocab AS (
                 SELECT DISTINCT unnest($toksSql) AS word
                 FROM documents WHERE doc_id % 2 = 0),
               held AS (
                 SELECT lang, unnest($toksSql) AS word
                 FROM documents WHERE doc_id % 2 = 1),
               j AS (
                 SELECT h.lang, h.word,
                        CASE WHEN v.word IS NULL THEN 1 ELSE 0 END AS oov
                 FROM held h LEFT JOIN vocab v ON v.word = h.word)
               SELECT lang, count(*) AS n_words,
                      CAST(count(*) FILTER (oov = 1) AS BIGINT) AS n_oov,
                      count(DISTINCT word) AS n_types,
                      CAST(count(DISTINCT CASE WHEN oov = 1 THEN word END) AS BIGINT) AS n_oov_types,
                      CAST(count(*) FILTER (oov = 1) AS BIGINT) * 10000
                        // count(*) AS oov_e4
               FROM j GROUP BY lang ORDER BY lang NULLS FIRST"""),
      doc = "held-out OOV census per language: vocab from even doc_ids, " +
        "occurrence + type OOV rates on the odd half at 1e4 scale — the " +
        "vocab-generalization gate a tokenizer build reports"),

    // ---- Tokenizer FERTILITY per language — the standard tokenizer-eval
    // metric (pieces emitted per word): a language whose fertility runs
    // high is under-served by the learned vocabulary (more compute per
    // word, worse effective context). Exact 1e2 integer rationals over
    // the trained unigram segmentation, per-language grain.
    GQuery("text_unigram_fertility",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val (_, seg) = TextAnalysis.unigramTrain(docs)
        TextAnalysis.withTokens(docs)
          .select(col("lang"), explode(col("toks")).as("word"))
          .join(seg.select(col("word"), size(col("seg")).as("n_sym")), Seq("word"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_sym")).cast("long").as("n_pieces"))
          .select(col("lang"), col("n_words"), col("n_pieces"),
            expr("n_pieces * 100 div n_words").as("fertility_e2"))
          .orderBy(col("lang").asc_nulls_first)
      },
      Some(s"""WITH $uniCtes
              |, held AS (
              |  SELECT d.lang, s.word, len(s.paths[s.len + 1]) AS n_sym
              |  FROM (SELECT lang, unnest($toksSql) AS word FROM documents) d
              |  JOIN s2_$uniMaxWordLen s ON s.word = d.word)
              |SELECT lang, count(*) AS n_words,
              |       CAST(SUM(n_sym) AS BIGINT) AS n_pieces,
              |       CAST(SUM(n_sym) AS BIGINT) * 100 // count(*) AS fertility_e2
              |FROM held GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin),
      doc = "unigram tokenizer fertility per language: pieces per word as " +
        "exact 1e2 rationals over the trained segmentation — the " +
        "which-language-is-under-served tokenizer metric"),

    // ---- Tokenizer COMPARISON card: both trained tokenizers (BPE merges
    // vs unigram-LM EM-prune) over the same corpus, per language — the
    // side-by-side a tokenizer selection actually reads: fertility
    // (pieces/word) and compression (chars/piece) as exact 1e2 rationals.
    // Composes the two proven train+apply chains; the oracle nests the
    // unigram chain as a derived table so the two CTE families can't
    // collide.
    GQuery("card_tokenizer_compare",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val (_, vocabB) = TextAnalysis.bpeTrain(docs, rounds = bpeRounds)
        val bpe = TextAnalysis.bpeApply(docs, vocabB)
          .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
            col("n_chars"))
        val (_, seg) = TextAnalysis.unigramTrain(docs)
        val uni = TextAnalysis.unigramApply(docs, seg)
          .select(col("doc_id"), col("n_pieces").as("n_uni_pieces"))
        docs.select(col("doc_id"), col("lang"))
          .join(bpe, Seq("doc_id")).join(uni, Seq("doc_id"))
          .groupBy(col("lang"))
          .agg(sum(col("n_words")).cast("long").as("n_words"),
            sum(col("n_chars")).cast("long").as("n_chars"),
            sum(col("n_bpe_tokens")).cast("long").as("n_bpe"),
            sum(col("n_uni_pieces")).cast("long").as("n_uni"))
          .select(col("lang"), col("n_words"), col("n_chars"), col("n_bpe"),
            col("n_uni"),
            expr("n_bpe * 100 div n_words").as("bpe_fertility_e2"),
            expr("n_uni * 100 div n_words").as("uni_fertility_e2"),
            expr("n_chars * 100 div n_bpe").as("chars_per_bpe_e2"),
            expr("n_chars * 100 div n_uni").as("chars_per_uni_e2"))
          .orderBy(col("lang").asc_nulls_first)
      },
      Some(s"""WITH ${bpeCtes(bpeRounds)},
              |bpedoc AS MATERIALIZED (
              |  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
              |         CAST(sum(len(w.toks)) AS BIGINT) AS n_bpe,
              |         CAST(sum(length(d.word)) AS BIGINT) AS n_chars
              |  FROM (SELECT doc_id, unnest($toksSql) AS word FROM documents) d
              |  JOIN w$bpeRounds w ON d.word = w.word
              |  GROUP BY 1),
              |unidoc AS MATERIALIZED (
              |  SELECT doc_id, n_pieces AS n_uni FROM ($uniApplySql) u)
              |SELECT l.lang,
              |       CAST(SUM(b.n_words) AS BIGINT) AS n_words,
              |       CAST(SUM(b.n_chars) AS BIGINT) AS n_chars,
              |       CAST(SUM(b.n_bpe) AS BIGINT) AS n_bpe,
              |       CAST(SUM(u.n_uni) AS BIGINT) AS n_uni,
              |       CAST(SUM(b.n_bpe) AS BIGINT) * 100
              |         // CAST(SUM(b.n_words) AS BIGINT) AS bpe_fertility_e2,
              |       CAST(SUM(u.n_uni) AS BIGINT) * 100
              |         // CAST(SUM(b.n_words) AS BIGINT) AS uni_fertility_e2,
              |       CAST(SUM(b.n_chars) AS BIGINT) * 100
              |         // CAST(SUM(b.n_bpe) AS BIGINT) AS chars_per_bpe_e2,
              |       CAST(SUM(b.n_chars) AS BIGINT) * 100
              |         // CAST(SUM(u.n_uni) AS BIGINT) AS chars_per_uni_e2
              |FROM documents l
              |JOIN bpedoc b USING (doc_id)
              |JOIN unidoc u USING (doc_id)
              |GROUP BY l.lang ORDER BY lang NULLS FIRST""".stripMargin),
      doc = "tokenizer comparison card: trained BPE vs trained unigram-LM " +
        "over the same corpus, per-language fertility (pieces/word) and " +
        "compression (chars/piece) as exact 1e2 rationals"),

    // ---- Positional-index PHRASE search — the capability BM25's
    // bag-of-words ranking can't express: "slow hash batch" must match as
    // CONSECUTIVE tokens. The classic positional-postings algorithm: a
    // (token, doc, pos) postings relation, then one equi-join per phrase
    // term on (doc, aligned position) — join cost bounded by the phrase
    // terms' postings lists (the rarest term bounds the chain). Here the
    // postings derive inline (three pruned corpus passes); at 100 TB they
    // are the PERSISTED positional index — the position-carrying sibling
    // of text_index_search_incremental's postings table, same lifecycle.
    // Output: per-doc match count + first occurrence.
    GQuery("text_phrase_search",
      (s, dir) => {
        val post = TextAnalysis.withTokens(Tables.documents(s, dir))
          .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "token")))
        def term(t: String, off: Int) = post.filter(col("token") === t)
          .select(col("doc_id"), (col("pos") - off).as("pos"))
        term("slow", 0)
          .join(term("hash", 1), Seq("doc_id", "pos"))
          .join(term("batch", 2), Seq("doc_id", "pos"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |post AS (
              |  SELECT doc_id, CAST(p AS INT) - 1 AS pos, toks[CAST(p AS INT)] AS token
              |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS p FROM t)),
              |m AS (
              |  SELECT a.doc_id, a.pos FROM post a
              |  JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              |             AND b.token = 'hash'
              |  JOIN post c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
              |             AND c.token = 'batch'
              |  WHERE a.token = 'slow')
              |SELECT doc_id, count(*) AS n_matches, min(pos) AS first_pos
              |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "positional-index phrase search: consecutive-position equi-joins " +
        "over (token, doc, pos) postings — cost bounded by the phrase terms' lists"),

    // ---- PMI-proxy collocations: adjacent pairs ranked by
    // T·c(xy)/(c(x)·c(y)) with a min-count floor (PMI overweights hapax
    // pairs) — the phrase-mining pass beside text_bpe_pairs' raw counts.
    GQuery("text_collocations",
      (s, dir) => TextAnalysis.collocationTopK(Tables.documents(s, dir),
        minCount = 5L, topN = 20),
      Some(s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
              |bg AS (
              |  SELECT unnest(CASE WHEN len(toks) >= 2
              |                     THEN list_transform(range(1, len(toks)),
              |                            i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])
              |                     ELSE CAST([] AS VARCHAR[]) END) AS pair
              |  FROM t),
              |uni AS (SELECT t2.w, count(*) AS c
              |        FROM (SELECT unnest($toksSql) AS w FROM documents) t2 GROUP BY t2.w),
              |bc AS (SELECT string_split(pair, ' ')[1] AS w1,
              |              string_split(pair, ' ')[2] AS w2,
              |              count(*) AS c_xy
              |       FROM bg GROUP BY pair),
              |tot AS (SELECT count(*) AS t_bigrams FROM bg),
              |scored AS (
              |  SELECT bc.w1, bc.w2, bc.c_xy, ux.c AS c_x, uy.c AS c_y,
              |         CAST(tot.t_bigrams * bc.c_xy AS DOUBLE)
              |           / CAST(ux.c * uy.c AS DOUBLE) AS score
              |  FROM bc JOIN uni ux ON bc.w1 = ux.w
              |          JOIN uni uy ON bc.w2 = uy.w
              |          CROSS JOIN tot
              |  WHERE bc.c_xy >= 5)
              |SELECT w1, w2, c_xy, c_x, c_y, score
              |FROM scored ORDER BY score DESC, w1, w2 LIMIT 20""".stripMargin),
      doc = "top-20 collocations by log-free PMI (T*c_xy/(c_x*c_y), one exact " +
        "double division; min-count 5 floors hapax noise)"),

    GQuery("text_token_freq",
      (s, dir) => TextAnalysis.tokenFrequencies(Tables.documents(s, dir))
        .orderBy(col("freq").desc, col("token")),
      Some(s"""SELECT t.token, count(*) AS freq
              FROM (SELECT unnest($toksSql) AS token FROM documents) t
              GROUP BY t.token ORDER BY freq DESC, t.token"""),
      doc = "corpus token histogram (explode → shuffle-bearing count)"),

    // ---- RAKE keywords: stopword-delimited candidate phrases scored by
    // summed member deg/freq — the unsupervised keyword pass next to
    // TF-IDF (corpus-relative) and BM25 (query-relative). Integer
    // milli-scores keep it hash-exact.
    GQuery("text_rake_keywords",
      (s, dir) => TextAnalysis.rakeKeywords(Tables.documents(s, dir), topN = 3)
        .orderBy(col("doc_id"), col("rank")),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |post AS (
              |  SELECT doc_id, CAST(p AS INT) - 1 AS pos, toks[CAST(p AS INT)] AS tok
              |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS p FROM t)),
              |member AS (
              |  SELECT doc_id, pos, tok,
              |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
              |  FROM post WHERE tok NOT IN ('the', 'a', 'of', 'and', 'is')),
              |phrases AS (
              |  SELECT doc_id, grp, count(*) AS n_words, min(pos) AS ppos,
              |         string_agg(tok, ' ' ORDER BY pos) AS phrase
              |  FROM member GROUP BY doc_id, grp),
              |ws AS (
              |  SELECT m.doc_id, m.tok,
              |         (1000 * CAST(SUM(p.n_words) AS BIGINT)) // CAST(count(*) AS BIGINT) AS wscore
              |  FROM member m JOIN phrases p USING (doc_id, grp)
              |  GROUP BY m.doc_id, m.tok),
              |sc AS (
              |  SELECT m.doc_id, m.grp, CAST(SUM(w.wscore) AS BIGINT) AS score_milli
              |  FROM member m JOIN ws w ON w.doc_id = m.doc_id AND w.tok = m.tok
              |  GROUP BY m.doc_id, m.grp),
              |ranked AS (
              |  SELECT s.doc_id, s.score_milli, p.phrase, p.n_words, p.ppos,
              |         ROW_NUMBER() OVER (PARTITION BY s.doc_id
              |           ORDER BY s.score_milli DESC, p.ppos) AS rank
              |  FROM sc s JOIN phrases p USING (doc_id, grp))
              |SELECT doc_id, CAST(rank AS INT) AS rank, phrase, n_words, score_milli
              |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin),
      doc = "RAKE keyword extraction: stopword-free phrase islands, " +
        "integer milli-scaled deg/freq word scores, top-3 phrases per doc"),

    // ---- χ² token↔class feature selection: which tokens are the
    // language's signature — the supervised sibling of TF-IDF. Log-free
    // (unlike MI), so exact; decimal/HUGEINT intermediates because
    // N·delta²·10⁴ overflows int64 past ~5k docs.
    GQuery("text_feature_chi2",
      (s, dir) => TextAnalysis.chi2FeatureSelection(Tables.documents(s, dir),
        classCol = "lang", minDf = 5L, topN = 20),
      Some(s"""WITH d AS (
              |  SELECT DISTINCT doc_id, lang AS cls, t.tok AS token
              |  FROM (SELECT doc_id, lang, unnest($toksSql) AS tok FROM documents) t),
              |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
              |ncls AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_c
              |         FROM documents GROUP BY lang),
              |dfw AS (SELECT token, CAST(count(*) AS BIGINT) AS df_w FROM d GROUP BY token),
              |dfwc AS (SELECT token, cls, CAST(count(*) AS BIGINT) AS df_wc
              |         FROM d GROUP BY token, cls),
              |j AS (
              |  SELECT w.token, w.cls, w.df_wc, f.df_w, c.n_c, t.n_docs,
              |         w.df_wc * (t.n_docs - c.n_c - (f.df_w - w.df_wc))
              |           - (f.df_w - w.df_wc) * (c.n_c - w.df_wc) AS delta
              |  FROM dfwc w JOIN dfw f USING (token) JOIN ncls c USING (cls), tot t
              |  WHERE f.df_w >= 5 AND f.df_w < t.n_docs)
              |SELECT token, cls, df_wc, df_w, n_c,
              |       CAST((10000 * CAST(n_docs AS HUGEINT) * delta * delta)
              |            // (CAST(df_w AS HUGEINT) * (n_docs - df_w) * n_c * (n_docs - n_c))
              |            AS BIGINT) AS chi2_e4
              |FROM j ORDER BY chi2_e4 DESC, token, cls LIMIT 20""".stripMargin),
      doc = "chi-square token/class feature selection: exact log-free 2x2 " +
        "presence statistic, 1e4-scaled integer, top-20 class-signature tokens"),

    // ---- Heaps'-law vocabulary growth: cumulative distinct types vs
    // cumulative tokens across corpus deciles. "First occurrence" makes
    // cumulative-distinct ONE min per token (no per-prefix re-distinct);
    // deciles contract everything to 10 rows before the only
    // unpartitioned window (adjudicated in PlanAuditSpec).
    GQuery("text_vocab_growth",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val md = docs.agg((max(col("doc_id")) + 1).as("md"))
        val docAgg = docs.crossJoin(broadcast(md))
          .groupBy(expr("doc_id * 10 div md").as("decile"))
          .agg(count(lit(1)).as("n_docs"),
            sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("n_tokens"))
        val firstDoc = TextAnalysis.withTokens(docs)
          .select(col("doc_id"), explode(col("toks")).as("token"))
          .groupBy(col("token")).agg(min(col("doc_id")).as("fd"))
        val newTypes = firstDoc.crossJoin(broadcast(md))
          .groupBy(expr("fd * 10 div md").as("decile"))
          .agg(count(lit(1)).as("new_types"))
        val w = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docAgg.join(newTypes, Seq("decile"), "left")
          .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .withColumn("cum_types", sum(col("new_types")).over(w))
          .select(col("decile"), col("n_docs"), col("n_tokens"),
            col("cum_tokens"), col("new_types"), col("cum_types"))
          .orderBy(col("decile"))
      },
      Some(s"""WITH md AS (SELECT max(doc_id) + 1 AS md FROM documents),
              |docagg AS (
              |  SELECT doc_id * 10 // md.md AS decile, count(*) AS n_docs,
              |         CAST(SUM(CAST(len($toksSql) AS BIGINT)) AS BIGINT) AS n_tokens
              |  FROM documents, md GROUP BY 1),
              |tk AS (SELECT t.tok AS token, min(doc_id) AS fd
              |       FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents) t
              |       GROUP BY t.tok),
              |nt AS (SELECT fd * 10 // md.md AS decile, count(*) AS new_types
              |       FROM tk, md GROUP BY 1)
              |SELECT d.decile, d.n_docs, d.n_tokens,
              |       CAST(SUM(d.n_tokens) OVER (ORDER BY d.decile
              |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
              |       COALESCE(n.new_types, 0) AS new_types,
              |       CAST(SUM(COALESCE(n.new_types, 0)) OVER (ORDER BY d.decile
              |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
              |FROM docagg d LEFT JOIN nt n USING (decile)
              |ORDER BY d.decile""".stripMargin),
      doc = "Heaps'-law vocab growth: cumulative types vs tokens per corpus " +
        "decile — first-occurrence min per token, 10-row bounded window"),

    // ---- Sentence segmentation stats: the sentence granularity nothing
    // else in the text family exposes (token ops are word-level, CDC
    // chunks are byte-level) — sentence-aware packing and per-sentence
    // quality filters start here. Split on the literal '. ' boundary,
    // per-doc census; one doc-keyed shuffle.
    GQuery("text_sentence_stats",
      (s, dir) => {
        val sents = Tables.documents(s, dir)
          .select(col("doc_id"),
            posexplode(split(col("text"), "\\. ")).as(Seq("sent_no", "sent")))
        sents.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_sentences"),
            sum(length(col("sent"))).as("total_chars"),
            max(length(col("sent"))).as("longest_chars"),
            expr("CAST(sum(size(split(sent, ' '))) AS BIGINT)").as("total_tokens"))
          .withColumn("mean_sent_tokens",
            col("total_tokens").cast("double") / col("n_sentences"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH s AS (
                SELECT doc_id, unnest(string_split(text, '. ')) AS sent
                FROM documents)
              SELECT doc_id, count(*) AS n_sentences,
                     CAST(SUM(length(sent)) AS BIGINT) AS total_chars,
                     CAST(MAX(length(sent)) AS INT) AS longest_chars,
                     CAST(SUM(len(string_split(sent, ' '))) AS BIGINT) AS total_tokens,
                     CAST(SUM(len(string_split(sent, ' '))) AS DOUBLE) / count(*) AS mean_sent_tokens
              FROM s GROUP BY doc_id ORDER BY doc_id"""),
      doc = "sentence segmentation census: per-doc sentence count, char/token " +
        "totals, longest sentence, mean tokens per sentence"),

    // ---- Corpus concentration (Herfindahl) across sources and langs —
    // the "is this dataset dominated by one crawl" governance number a
    // dataset card quotes. Token shares as 1e4-scaled truncated integers
    // (deterministic both engines), HHI = Σ share² div 10⁴ ∈ [0,10⁴];
    // one bounded groupBy per dimension + a scalar total.
    GQuery("curate_source_hhi",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        def hhi(dim: String) = {
          val g = docs.groupBy(col(dim))
            .agg(sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("toks"))
          val tot = g.agg(sum(col("toks")).as("tot"),
            count(lit(1)).as("n_groups"))
          g.crossJoin(broadcast(tot))
            .withColumn("share_e4", expr("toks * 10000 div tot"))
            .agg(max(col("n_groups")).as("n_groups"),
              expr("sum(share_e4 * share_e4) div 10000").as("hhi_e4"),
              max(col("share_e4")).as("top_share_e4"))
            .select(lit(dim).as("dimension"), col("n_groups"),
              col("hhi_e4"), col("top_share_e4"))
        }
        hhi("source").unionByName(hhi("lang")).orderBy(col("dimension"))
      },
      Some("""WITH t AS (SELECT source, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
                     FROM documents),
              bysrc AS (SELECT source, CAST(SUM(toks) AS BIGINT) AS toks
                        FROM t GROUP BY source),
              bylang AS (SELECT lang, CAST(SUM(toks) AS BIGINT) AS toks
                         FROM t GROUP BY lang),
              s AS (
                SELECT 'source' AS dimension,
                       CAST(count(*) AS BIGINT) AS n_groups,
                       CAST(SUM(sh * sh) // 10000 AS BIGINT) AS hhi_e4,
                       CAST(MAX(sh) AS BIGINT) AS top_share_e4
                FROM (SELECT toks * 10000 // (SELECT SUM(toks) FROM bysrc) AS sh
                      FROM bysrc)),
              l AS (
                SELECT 'lang' AS dimension,
                       CAST(count(*) AS BIGINT) AS n_groups,
                       CAST(SUM(sh * sh) // 10000 AS BIGINT) AS hhi_e4,
                       CAST(MAX(sh) AS BIGINT) AS top_share_e4
                FROM (SELECT toks * 10000 // (SELECT SUM(toks) FROM bylang) AS sh
                      FROM bylang))
              SELECT * FROM l UNION ALL SELECT * FROM s ORDER BY dimension"""),
      doc = "corpus concentration census: 1e4-scaled HHI + top share across " +
        "sources and langs (the dataset-card dominance number)"),

    // ---- Suffix morphology census — the character-level signal the
    // stopword langid doesn't use: top-5 three-char token suffixes per
    // language (inflectional morphology is suffix-heavy in the corpus
    // languages). One explode + (lang, suffix) count + lang-partitioned
    // rank; deterministic ties by suffix.
    GQuery("text_suffix_census",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val sfx = TextAnalysis.withTokens(Tables.documents(s, dir))
          .select(col("lang"), explode(col("toks")).as("tok"))
          .filter(length(col("tok")) >= 4)
          .select(col("lang"), expr("substring(tok, -3, 3)").as("suffix"))
          .groupBy(col("lang"), col("suffix"))
          .agg(count(lit(1)).as("n_tokens"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("n_tokens").desc, col("suffix"))
        sfx.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("lang"), col("rank").cast("int").as("rank"),
            col("suffix"), col("n_tokens"))
          .orderBy(col("lang"), col("rank"))
      },
      Some(s"""WITH t AS (
              |  SELECT lang, u.tok FROM (
              |    SELECT lang, unnest($toksSql) AS tok FROM documents) u
              |  WHERE length(u.tok) >= 4),
              |c AS (SELECT lang, right(tok, 3) AS suffix, count(*) AS n_tokens
              |      FROM t GROUP BY 1, 2),
              |r AS (SELECT lang, suffix, n_tokens,
              |             ROW_NUMBER() OVER (PARTITION BY lang
              |               ORDER BY n_tokens DESC, suffix) AS rank
              |      FROM c)
              |SELECT lang, CAST(rank AS INT) AS rank, suffix, n_tokens
              |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin),
      doc = "suffix morphology census: top-5 three-char token suffixes per " +
        "language (char-level signal beside stopword langid)"),

    // ---- Gopher quality rules (Rae et al. 2021 §A1.1): the five
    // word-level rules as integer-only flags, per-language acceptance
    // census. Division-free (mean-word-length as a cross-multiplied
    // integer inequality) → exact cross-engine.
    GQuery("text_gopher_rules",
      (s, dir) => TextAnalysis.gopherRulesCensus(Tables.documents(s, dir)),
      Some("""WITH f AS (
              |  SELECT lang,
              |         CAST(len(t) AS BIGINT) AS n_tokens,
              |         CAST(length(text) - len(t) + 1 AS BIGINT) AS word_chars,
              |         CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
              |              AS BIGINT) AS n_alpha,
              |         CAST(len(list_intersect(list_distinct(t),
              |              ['the', 'a', 'of', 'and', 'is'])) AS BIGINT) AS n_stop,
              |         CAST(length(text) - length(replace(text, '#', ''))
              |              + (length(text) - length(replace(text, '...', ''))) // 3
              |              AS BIGINT) AS n_sym
              |  FROM (SELECT lang, text, string_split(text, ' ') AS t FROM documents)),
              |g AS (
              |  SELECT lang,
              |         (n_tokens < 50 OR n_tokens > 100000) AS f_wc,
              |         (word_chars < 3 * n_tokens OR word_chars > 10 * n_tokens) AS f_mwl,
              |         (5 * n_alpha < 4 * n_tokens) AS f_al,
              |         (n_stop < 2) AS f_st,
              |         (10 * n_sym > n_tokens) AS f_sy
              |  FROM f)
              |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(count(CASE WHEN f_wc THEN 1 END) AS BIGINT) AS n_fail_word_count,
              |       CAST(count(CASE WHEN f_mwl THEN 1 END) AS BIGINT) AS n_fail_mean_word_len,
              |       CAST(count(CASE WHEN f_al THEN 1 END) AS BIGINT) AS n_fail_alpha_ratio,
              |       CAST(count(CASE WHEN f_st THEN 1 END) AS BIGINT) AS n_fail_stopword,
              |       CAST(count(CASE WHEN f_sy THEN 1 END) AS BIGINT) AS n_fail_symbol_ratio,
              |       CAST(count(CASE WHEN NOT f_wc AND NOT f_mwl AND NOT f_al
              |                       AND NOT f_st AND NOT f_sy THEN 1 END) AS BIGINT)
              |         AS n_pass_all
              |FROM g GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin),
      doc = "Gopher-rule quality census: five word-level rules (word count, " +
        "mean word length, alpha-word ratio, required stopwords, symbol " +
        "ratio) as division-free integer flags, per-language fail counts + " +
        "pass-all survivors"),

    // ---- Bigram-LM surprisal in integer bits: the CCNet perplexity
    // filter with conditional p(v|w) add-one smoothing, −log₂p quantized
    // exactly via length(bin(a div b))−1 — no float log anywhere, so the
    // census hash-compares. Complements text_bigram_lm (raw bigram
    // frequency) with true conditional-transition scoring.
    GQuery("text_lm_surprisal",
      (s, dir) => TextAnalysis.lmSurprisalCensus(Tables.documents(s, dir)),
      Some(s"""WITH toks AS (SELECT doc_id, lang, $toksSql AS t FROM documents),
              |bi AS (
              |  SELECT doc_id, lang, t[CAST(i AS INT)] AS w, t[CAST(i AS INT) + 1] AS v
              |  FROM (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i FROM toks)),
              |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
              |        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
              |vs AS (SELECT CAST(count(*) AS BIGINT) AS vsz FROM uni),
              |big AS (SELECT w, v, CAST(count(*) AS BIGINT) AS cwv FROM bi GROUP BY w, v),
              |sc AS (
              |  SELECT doc_id, lang,
              |         CAST(length(printf('%b', (cw + vsz) // (cwv + 1))) - 1
              |              AS BIGINT) AS bits
              |  FROM bi JOIN big USING (w, v) JOIN uni USING (w), vs),
              |d AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
              |             CAST(SUM(bits) AS BIGINT) AS bits_sum
              |      FROM sc GROUP BY doc_id, lang)
              |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
              |       CAST(SUM(bits_sum) AS BIGINT) AS bits_sum,
              |       CAST(100 * SUM(bits_sum) // SUM(n_bigrams) AS BIGINT) AS mean_bits_e2,
              |       CAST(MAX(100 * bits_sum // n_bigrams) AS BIGINT) AS worst_doc_bits_e2
              |FROM d GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin),
      doc = "bigram-LM surprisal census: add-one-smoothed conditional " +
        "p(v|w), per-token surprisal as exact integer bits " +
        "(floor-log2 via binary length), per-language mean + worst-doc " +
        "bits/token — the perplexity filter, float-log-free"),

    // ---- Zipf-slope census: least-squares slope of log2(freq) on
    // log2(rank) over the per-language top-128 terms — natural language
    // sits near −1; templated/generated text drifts flat. Both logs as
    // exact integer bits (binary length), slope as the cross-multiplied
    // exact LS form with sign-split 1e4 division. Corpus contracts to the
    // (lang, term) frequency table before the rank window.
    GQuery("text_zipf_slope",
      (s, dir) => TextAnalysis.zipfSlopeCensus(Tables.documents(s, dir)),
      Some(s"""WITH f AS (
              |  SELECT lang, w, CAST(count(*) AS BIGINT) AS f
              |  FROM (SELECT lang, unnest($toksSql) AS w FROM documents)
              |  GROUP BY lang, w),
              |r AS (SELECT lang,
              |             ROW_NUMBER() OVER (PARTITION BY lang
              |               ORDER BY f DESC, w) AS r, f
              |      FROM f),
              |p AS (SELECT lang,
              |             CAST(length(printf('%b', r)) - 1 AS BIGINT) AS x,
              |             CAST(length(printf('%b', f)) - 1 AS BIGINT) AS y
              |      FROM r WHERE r <= 128),
              |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
              |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
              |             CAST(SUM(x * y) AS BIGINT) AS sxy,
              |             CAST(SUM(x * x) AS BIGINT) AS sx2
              |      FROM p GROUP BY lang)
              |SELECT lang, n_terms,
              |       CAST(CASE WHEN 10000 * (n_terms * sxy - sx * sy) < 0
              |                 THEN -((-(10000 * (n_terms * sxy - sx * sy)))
              |                        // (n_terms * sx2 - sx * sx))
              |                 ELSE (10000 * (n_terms * sxy - sx * sy))
              |                      // (n_terms * sx2 - sx * sx) END AS BIGINT) AS slope_e4
              |FROM a ORDER BY lang""".stripMargin),
      doc = "Zipf-slope census: exact integer-bits log-log least squares " +
        "over per-language top-128 term frequencies — natural-language " +
        "shape audit (slope near -1e4) against templated/generated drift")
  )
}
