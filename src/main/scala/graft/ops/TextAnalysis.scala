package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table: token statistics, quality scoring, n-gram-heuristic language ID,
  * and canonical fingerprinting.
  *
  * Everything is a narrow projection over a single scan — no shuffles except
  * where a groupBy is the semantics (token frequencies). All arithmetic is
  * integer counts plus one final double division, so results are independent
  * of partitioning and match a single-threaded oracle exactly.
  *
  * Tokenization contract: corpus documents are single-space separated ASCII
  * word salad (TESTDATA.md), so `split(text, ' ')` is the whole tokenizer.
  * Real corpora would swap in a regexp tokenizer here; the operator shapes
  * (arrays + higher-order functions, no UDFs) stay the same.
  */
object TextAnalysis {

  /** Per-language stopword lists for the n-gram/stopword language heuristic.
    * Order matters: it is the deterministic tie-break (first strictly-greater
    * score wins; default 'en').
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "los", "y", "un", "una"),
    "fr" -> Seq("le", "la", "et", "les", "une"),
    "zh" -> Seq("de5", "shi4", "le5", "bu4", "wo3"))

  def withTokens(docs: DataFrame): DataFrame =
    docs.withColumn("toks", split(col("text"), " "))

  /** Token counting: whitespace tokens, distinct types, type/token ratio,
    * mean token length (exact: chars minus separators over token count).
    */
  def tokenStats(docs: DataFrame): DataFrame =
    withTokens(docs).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(col("toks")).as("n_tokens"),
      size(array_distinct(col("toks"))).as("n_types"),
      (size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
        .as("type_token_ratio"),
      ((length(col("text")) - size(col("toks")) + 1).cast("double") / size(col("toks")))
        .as("mean_token_len"))

  private def stopwordHits(lang: String): Column = {
    val list = stopwords.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    expr(s"size(filter(toks, t -> t IN ($list)))")
  }

  /** Language ID by stopword-hit ratio with a deterministic argmax. */
  def languageId(docs: DataFrame): DataFrame = {
    val withScores = stopwords.foldLeft(withTokens(docs)) { case (df, (lang, _)) =>
      df.withColumn(s"score_$lang",
        stopwordHits(lang).cast("double") / size(col("toks")))
    }
    val langs = stopwords.map(_._1)
    // argmax with first-listed-language tie-break: lang wins if strictly
    // greater than every language listed before it and >= every one after.
    val predicted = langs.tail.foldLeft(when(lit(true), lit("en"))) { (acc, l) =>
      val beats = langs.takeWhile(_ != l).map(p => col(s"score_$l") > col(s"score_$p")) ++
        langs.dropWhile(_ != l).tail.map(p => col(s"score_$l") >= col(s"score_$p"))
      when(beats.reduce(_ && _), lit(l)).otherwise(acc)
    }
    withScores.select(
      Seq(col("doc_id"), col("lang").as("labeled_lang"), predicted.as("predicted_lang")) ++
        langs.map(l => col(s"score_$l")): _*)
  }

  /** Quality scoring: length/diversity/stopword signals + composite flag.
    * Thresholds are illustrative; the operator shape (pure column math,
    * zero shuffles) is the point.
    */
  def qualityScore(docs: DataFrame): DataFrame =
    tokenStats(docs)
      .join(withTokens(docs).select(col("doc_id"),
        (stopwordHits("en").cast("double") / size(col("toks"))).as("stopword_ratio")),
        Seq("doc_id"))
      .withColumn("is_quality",
        col("n_tokens") >= 20 && col("type_token_ratio") >= 0.3 &&
          col("mean_token_len") >= 2.0 && col("mean_token_len") <= 12.0)

  /** Canonical text normalization — the standard pass BEFORE any hashing
    * or dedup, so byte-distinct spellings of the same content hash
    * identically: Unicode NFC composition (native [[graft.functions
    * .NfcNormalize]] — `e`+combining-acute becomes `é`), case folding,
    * whitespace-run collapse, trim. A pure per-row projection inside
    * whole-stage codegen; no shuffle, safe to fuse ahead of any dedup op.
    */
  def withNormalizedText(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.withColumn("norm_text",
      trim(regexp_replace(lower(expr("graft_nfc(text)")), "\\s+", " ")))
  }

  /** Canonical document fingerprint: md5 over the sorted distinct token set.
    * Word-order- and duplication-insensitive, so near-copies that only
    * permute/repeat tokens collide — the cheap first pass before MinHash.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    withTokens(docs).select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(col("toks"))))).as("fingerprint"))

  /** BPE-ish regex token count: letter runs, digit runs, and single
    * punctuation marks each count as one token. The pattern deliberately
    * avoids backslash classes: Spark SQL string literals consume `\s`
    * while DuckDB keeps it — an engine-parity trap; `[^a-z0-9 ]` with a
    * literal space is identical everywhere.
    */
  val regexTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def regexTokenStats(docs: DataFrame): DataFrame =
    withTokens(docs).select(
      col("doc_id"),
      size(col("toks")).as("n_ws_tokens"),
      size(expr(s"regexp_extract_all(text, '$regexTokenPattern', 0)")).as("n_re_tokens"))

  /** Rolling-hash (Rabin-Karp) document fingerprint — position-sensitive,
    * unlike [[fingerprint]]'s token-set md5; the building block for
    * content-defined chunking. Native expression over Unicode code points.
    */
  def rollingFingerprint(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), expr("graft_rolling_hash(text)").as("rhash"))
  }

  /** Content-defined chunking: split each document at rolling-hash-mask
    * boundaries ([[graft.functions.CdcBoundaries]]) and fingerprint every
    * chunk — (doc_id, chunk_no, start, chunk_len, chunk_hash), the dedup
    * unit for a training-data pipeline (chunk hashes survive edits
    * elsewhere in the document, unlike whole-doc hashes). Boundary
    * positions are Unicode code points — the unit `substring` consumes —
    * so chunking is correct on non-ASCII text. Everything after
    * the boundary expression is per-row array algebra: no shuffle at all —
    * a downstream `groupBy(chunk_hash)` dedups chunks corpus-wide with the
    * one exchange that semantic requires.
    */
  def cdcChunks(docs: DataFrame, w: Int = 16, divisor: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("bs", expr(s"graft_cdc_boundaries(text, $w, $divisor)"))
      .select(col("doc_id"), col("text"), col("bs"),
        posexplode(col("bs")).as(Seq("idx", "end")))
      .withColumn("chunk_no", (col("idx") + 1).cast("int"))
      .withColumn("start", when(col("idx") === 0, lit(1))
        .otherwise(element_at(col("bs"), col("idx")) + 1).cast("int"))
      .withColumn("chunk_len", (col("end") - col("start") + 1).cast("int"))
      .withColumn("chunk_hash",
        expr("graft_rolling_hash(substring(text, start, chunk_len))"))
      .select(col("doc_id"), col("chunk_no"), col("start"),
        col("chunk_len"), col("chunk_hash"))
  }

  /** Deterministic dataset splitting: assign every document to
    * train/val/test by an md5 bucket of its id — the held-out-split
    * primitive of a training pipeline. Hash-based assignment is stable
    * under reruns, partitioning, and corpus growth (a document never
    * changes split when new data arrives), which `sample()`-style RNG
    * splitting cannot guarantee — and md5 keeps it oracle-checkable.
    * Buckets: [0, valPct) = val, [valPct, valPct+testPct) = test,
    * rest = train.
    */
  def withSplit(docs: DataFrame, valPct: Int = 1, testPct: Int = 1): DataFrame =
    docs
      .withColumn("_bucket", expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS INT) % 100"))
      .withColumn("split",
        when(col("_bucket") < valPct, lit("val"))
          .when(col("_bucket") < valPct + testPct, lit("test"))
          .otherwise(lit("train")))
      .drop("_bucket")

  /** PII scrubbing patterns — deliberately backslash-free (the `\d`/`\w`
    * classes are consumed differently by Spark SQL string literals and
    * DuckDB, the same engine-parity trap [[regexTokenPattern]] documents)
    * and simple enough that Java regex and RE2 agree byte-for-byte:
    * long digit runs (phone/account numbers) and email-shaped tokens.
    */
  val piiLongNumberPattern = "[0-9]{7,}"
  val piiEmailPattern = "[a-zA-Z0-9.]+@[a-zA-Z0-9.]+"

  /** PII redaction report: per document, the count of each PII category
    * and the md5 of the scrubbed text (emails replaced first, then digit
    * runs — and the digit-run COUNT is taken on the email-redacted
    * intermediate, so an address's digits are never double-counted across
    * categories). Emitting the hash rather than the full scrubbed payload
    * keeps the result hash-comparable and the query output narrow; the
    * scrubbed text itself is `redacted` below for pipeline use. Pure
    * per-row column math — zero shuffles.
    */
  def redactPii(docs: DataFrame, token: String = "<PII>"): DataFrame = {
    val emailsRedacted = regexp_replace(col("text"), piiEmailPattern, safeReplacement(token))
    docs.select(
      col("doc_id"),
      size(expr(s"regexp_extract_all(text, '$piiEmailPattern', 0)")).as("n_emails"),
      size(regexp_extract_all(emailsRedacted, lit(piiLongNumberPattern), lit(0)))
        .as("n_long_numbers"),
      md5(redacted(token)).as("redacted_md5"))
  }

  /** The replacement string `regexp_replace` actually consumes: Java
    * replacement semantics treat `$` as a group reference and `\` as its
    * escape, so a caller token containing either would corrupt the output
    * (driver ADVICE.md finding) — quote it the way
    * `java.util.regex.Matcher.quoteReplacement` does. Digits can't be
    * quoted away: a 7+-digit token would be re-redacted by the digit-run
    * pass (skewing `n_long_numbers` and the md5), so digit-bearing tokens
    * are rejected outright.
    */
  private def safeReplacement(token: String): String = {
    require(!token.exists(_.isDigit),
      s"redaction token '$token' contains digits — it would itself match the " +
        "long-digit-run PII pass; use a digit-free token")
    java.util.regex.Matcher.quoteReplacement(token)
  }

  /** The scrubbed text column (emails first, then long digit runs). */
  def redacted(token: String): Column = {
    val repl = safeReplacement(token)
    regexp_replace(
      regexp_replace(col("text"), piiEmailPattern, repl),
      piiLongNumberPattern, repl)
  }

  /** Corpus token frequencies (explode → count): the one genuinely
    * shuffle-bearing text op; partial aggregation collapses it to
    * |vocabulary| rows per partition before the exchange.
    */
  def tokenFrequencies(docs: DataFrame): DataFrame =
    withTokens(docs)
      .select(explode(col("toks")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))

  /** Repetition filter signals (the classic web-scrape quality gate:
    * machine-generated and boilerplate text repeats itself): the most
    * frequent token's share of the document, and the fraction of
    * duplicated bigrams. Top-token counts go through an explode →
    * two-level groupBy (linear, partial-aggregated — per-row
    * `transform(distinct, count-each)` would be O(n²) per document);
    * bigram duplication is pure per-row array algebra. The composite flag
    * uses the standard ~0.2 thresholds.
    */
  def repetitionStats(docs: DataFrame,
                      topTokenTau: Double = 0.2,
                      dupBigramTau: Double = 0.2): DataFrame = {
    val top = withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id")).agg(max(col("cnt")).as("top_cnt"))
    // sequence(1, 0) would step DOWNWARD in Spark (≠ DuckDB's empty
    // range), so single-token documents are guarded explicitly
    val bigrams = when(size(col("toks")) >= 2,
      expr("transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
    withTokens(docs)
      .select(col("doc_id"), size(col("toks")).as("n_tokens"), bigrams.as("bg"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("bg")).as("n_bigrams"),
        (size(col("bg")) - size(array_distinct(col("bg")))).as("n_dup_bigrams"))
      .join(top, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        (col("top_cnt").cast("double") / col("n_tokens")).as("top_token_frac"),
        when(col("n_bigrams") > 0,
          col("n_dup_bigrams").cast("double") / col("n_bigrams"))
          .otherwise(lit(0.0)).as("dup_bigram_frac"))
      .withColumn("is_repetitive",
        col("top_token_frac") > topTokenTau || col("dup_bigram_frac") > dupBigramTau)
  }

  /** [[repetitionStats]]' flags in a PUSHDOWN-SAFE aggregate formulation —
    * the form to compose FILTERS on. Filtering the projection form on
    * `is_repetitive` lets Catalyst push the predicate through the
    * projections, inlining (and duplicating ~6×) the whole
    * split+transform bigram expression into one filter predicate —
    * measured 9× the honest cost at sf0.1. Here the fracs come from
    * explode + groupBy aggregates, so a downstream filter lands on
    * aggregated scalars and the text kernels evaluate exactly once.
    * Flag values are identical (CurateSpec pins the equivalence).
    */
  def repetitionFlags(docs: DataFrame,
                      topTokenTau: Double = 0.2,
                      dupBigramTau: Double = 0.2): DataFrame = {
    val toks = withTokens(docs)
    val top = toks.select(col("doc_id"), explode(col("toks")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_cnt"), sum(col("c")).as("n_tokens"))
    val bigrams = when(size(col("toks")) >= 2,
      expr("transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
    val bg = toks.select(col("doc_id"), explode(bigrams).as("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bg"), countDistinct(col("b")).as("n_bg_d"))
    top.join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        ((col("top_cnt").cast("double") / col("n_tokens")) > topTokenTau ||
          coalesce((col("n_bg") - col("n_bg_d")).cast("double") / col("n_bg"),
            lit(0.0)) > dupBigramTau).as("is_repetitive"))
  }

  /** The distributed core of BPE vocabulary training: the corpus-wide
    * adjacent-token-pair census. Each training round counts every adjacent
    * symbol pair, merges the most frequent one, and repeats; at corpus
    * scale the COUNT is the expensive step — one explode of (n_tokens − 1)
    * pairs per document and one partial-aggregated groupBy, exactly the
    * shape of [[tokenFrequencies]] — while the argmax row and the merge
    * application are bounded. `topN` bounds the output (the merge loop
    * consumes only row 1; the top slice is what a vocabulary-build monitor
    * inspects), ordered (freq DESC, pair ASC) so ties are deterministic.
    *
    * The single-token-document guard mirrors [[repetitionStats]]:
    * `sequence(1, 0)` would step DOWNWARD in Spark (≠ DuckDB's empty
    * range).
    */
  def bpePairCensus(docs: DataFrame, topN: Int = 30): DataFrame = {
    val pairs = when(size(col("toks")) >= 2,
      expr("transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
    withTokens(docs)
      .select(explode(pairs).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(topN)
  }

  /** BPE merge-table TRAINING (Sennrich et al. 2016) — the iterative loop
    * [[bpePairCensus]] is the per-round census of. Classic vocabulary-table
    * formulation: training runs over the DISTINCT-word frequency table
    * (vocab-scale — millions of rows at 100 TB, never the corpus), each
    * word starting as its character sequence. Per round: weighted adjacent
    * -pair census over the vocab (one explode + partial-aggregated sum),
    * argmax with deterministic (freq DESC, pair ASC) tie-break — a 1-row
    * bounded collect, the selection is inherently sequential — then the
    * merge applied per word by the native greedy kernel
    * ([[graft.functions.BpeMerge]]), with a `localCheckpoint` lineage cut
    * per round (the [[GraphOps]] bounded-round convention).
    *
    * Returns (merges, vocab): merges = (round, lhs, rhs, freq) — the
    * trained merge table, `rounds` rows; vocab = (word, freq, toks) after
    * all merges — the trained tokenizer's word → symbols map.
    */
  def bpeTrain(docs: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    var vocab = withTokens(docs)
      .select(explode(col("toks")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      // sequence(1, 0) steps DOWNWARD in Spark (the repetitionStats
      // guard): empty-string words get an explicitly empty symbol list
      .withColumn("toks", when(length(col("word")) >= 1,
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))
      .localCheckpoint()
    val pairsExpr = when(size(col("toks")) >= 2,
      expr("transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = vocab.select(col("freq"), explode(pairsExpr).as("p"))
        .groupBy(col("p")).agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("p")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val Array(a, b) = best.head.getAs[String]("p").split(" ", 2)
        merges += ((r, a, b, best.head.getAs[Long]("f")))
        vocab = vocab.withColumn("toks",
            call_function("graft_bpe_merge", col("toks"), lit(a), lit(b)))
          .localCheckpoint()
      }
      r += 1
    }
    import docs.sparkSession.implicits._
    (merges.toSeq.toDF("round", "lhs", "rhs", "freq"), vocab)
  }

  /** Trained-tokenizer APPLICATION: tokenize the corpus with the vocab
    * produced by [[bpeTrain]] — one corpus-scale explode to (doc, word),
    * one join against the vocab map (word-keyed; broadcastable when the
    * vocab is small, shuffle-joined at 100 TB), one per-doc aggregate.
    * Per doc: whitespace words, BPE symbols after the trained merges, and
    * characters — n_chars / n_bpe_tokens is the compression the merge
    * table bought, the metric a tokenizer-training monitor tracks.
    */
  def bpeApply(docs: DataFrame, vocab: DataFrame): DataFrame =
    withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .join(vocab.select(col("word"), size(col("toks")).as("n_sym"),
        length(col("word")).as("n_chr")), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym")).cast("long").as("n_bpe_tokens"),
        sum(col("n_chr")).cast("long").as("n_chars"))

  /** Unigram-LM tokenizer TRAINING (SentencePiece-style, Kudo 2018) — the
    * EM-prune sibling of [[bpeTrain]], in a deterministic hard-EM (Viterbi)
    * formulation both engines can replay bit-for-bit:
    *
    *   1. SEED: candidate pieces = every substring of length ≤ `maxPieceLen`
    *      of the DISTINCT-word vocabulary (vocab-scale, never the corpus),
    *      freq-weighted occurrence counts; the seed vocabulary keeps ALL
    *      single characters plus the top `seedMultis` multi-char pieces
    *      (count DESC, piece ASC ties).
    *   2. Per EM round: probabilities p = count / total over the current
    *      vocabulary; every vocab word Viterbi-segmented under p by the
    *      native [[graft.functions.UnigramSegment]] kernel (dp products are
    *      single IEEE multiplies, ties to the shortest piece — the oracle
    *      replays the identical DP as an unrolled per-position CTE chain);
    *      new counts = freq-weighted piece usage over the segmentations.
    *   3. PRUNE between rounds: chars always survive (counts floored at 1
    *      so coverage never collapses — the SentencePiece invariant), and
    *      only the top `pruneMultis` multi-char pieces stay.
    *
    * Scale shape: training state is the distinct-word table (one shuffle to
    * build, `localCheckpoint` lineage cuts per round) plus a BOUNDED piece
    * vocabulary (≤ |charset| + seedMultis rows) collected per round — the
    * codebook convention, same contract as IVF centroids. The corpus text
    * itself is touched exactly once (the word census).
    *
    * Returns (counts, segmented): counts = (round, piece, cnt) — each EM
    * round's freq-weighted usage census over that round's vocabulary (the
    * pruning evidence); segmented = the final word → pieces map, the
    * trained tokenizer [[unigramApply]] serves.
    */
  /** The shared SEED vocabulary construction ([[unigramTrain]] step 1,
    * reused by [[wordpieceApply]]): distinct-word census + all-substring
    * occurrence counts (freq-weighted, overlaps counted — each start
    * position is one occurrence), vocabulary = ALL single chars + the top
    * `seedMultis` multi-char pieces (count DESC, piece ASC ties). Both
    * collects are bounded (|charset| + seedMultis rows — the codebook
    * convention). Returns (distinct words with freq, vocab pieces+counts).
    */
  private def wordSeedVocab(docs: DataFrame, seedMultis: Int, maxPieceLen: Int)
      : (DataFrame, Seq[(String, Long)]) = {
    val words = withTokens(docs)
      .select(explode(col("toks")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val subExpr = expr(
      s"""flatten(transform(sequence(1, $maxPieceLen),
            l -> CASE WHEN length(word) >= l
                 THEN transform(sequence(1, length(word) - l + 1),
                                s -> substring(word, s, l))
                 ELSE CAST(array() AS ARRAY<STRING>) END))""")
    val seed = words.select(col("freq"), explode(subExpr).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val chars = seed.filter(length(col("piece")) === 1).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val multis = seed.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(seedMultis).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    (words, (chars ++ multis).toSeq)
  }

  def unigramTrain(docs: DataFrame, rounds: Int = 2, seedMultis: Int = 20,
                   pruneMultis: Int = 12, maxPieceLen: Int = 4): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.functions.typedLit
    val (words, seedPieces) = wordSeedVocab(docs, seedMultis, maxPieceLen)
    var vocab: Seq[(String, Long)] = seedPieces
    val roundRows = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var segmented: DataFrame = null
    var r = 1
    while (r <= rounds) {
      val total = vocab.map(_._2).sum
      val ps = vocab.map(_._1)
      val qs = vocab.map(_._2.toDouble / total.toDouble)
      segmented = words.withColumn("seg",
          call_function("graft_unigram_segment", col("word"),
            typedLit(ps), typedLit(qs), lit(maxPieceLen)))
        .localCheckpoint()
      val used = segmented.select(col("freq"), explode(col("seg")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .collect() // bounded: ≤ current vocab size
        .map(row => row.getString(0) -> row.getLong(1)).toMap
      val counted = vocab.map { case (p, _) => (p, used.getOrElse(p, 0L)) }
      roundRows ++= counted.map { case (p, c) => (r, p, c) }
      if (r < rounds) {
        // prune: chars floored at 1 (coverage), top pruneMultis multis
        // (zero-count multis may survive the cut on tiny vocabs — their
        // probability 0 can never beat an all-char path, so harmless)
        val nextChars = counted.filter(_._1.length == 1)
          .map { case (p, c) => (p, math.max(c, 1L)) }
        val nextMultis = counted.filter(_._1.length >= 2)
          .sortBy { case (p, c) => (-c, p) }.take(pruneMultis)
        vocab = nextChars ++ nextMultis
      }
      r += 1
    }
    import docs.sparkSession.implicits._
    (roundRows.toSeq.toDF("round", "piece", "cnt"), segmented)
  }

  /** Trained unigram tokenizer APPLICATION — [[bpeApply]]'s sibling: one
    * corpus-scale explode to (doc, word), one join against the trained
    * word → pieces map (word-keyed; broadcastable small, shuffle-joined at
    * 100 TB), one per-doc aggregate. n_chars / n_pieces is the compression
    * the learned vocabulary bought.
    */
  def unigramApply(docs: DataFrame, segmented: DataFrame): DataFrame =
    withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .join(segmented.select(col("word"), size(col("seg")).as("n_sym"),
        length(col("word")).as("n_chr")), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym")).cast("long").as("n_pieces"),
        sum(col("n_chr")).cast("long").as("n_chars"))

  /** WordPiece-style tokenizer: GREEDY LONGEST-MATCH-FIRST segmentation
    * (the BERT inference algorithm — at each position take the longest
    * vocabulary piece that matches, 1-char pieces guarantee coverage) —
    * the third tokenizer family next to BPE's merge replay and the
    * unigram LM's Viterbi. The vocabulary is the shared seed
    * ([[wordSeedVocab]]: all chars + top-`seedMultis` multis), carried as
    * a literal array (the codebook convention), so segmentation is ONE
    * whole-stage-codegen fold per distinct word — `aggregate` over
    * positions with a (pos, n_pieces) struct accumulator, each step
    * trying piece lengths maxPieceLen…2 by `array_contains` and falling
    * back to the single char. A truncated end-of-word probe matches its
    * shorter in-vocab string and over-advances `pos` harmlessly (the
    * word is consumed either way) — the DuckDB mirror makes the
    * identical decisions. Corpus text is touched twice: the distinct-word
    * census and the per-doc join census.
    */
  /** The greedy longest-match-first fold (ONE codegen'd `aggregate` per
    * distinct word over a `_wpv` vocab-literal column) — shared by
    * [[wordpieceApply]] and the vocab-size sweep so the two cannot
    * drift. */
  private def wpSegExpr(maxPieceLen: Int): String = {
    val bestL = (maxPieceLen to 2 by -1).map(l =>
      s"WHEN array_contains(_wpv, substring(word, CAST(acc.pos AS INT), $l)) " +
        s"THEN CAST($l AS BIGINT)").mkString(" ")
    s"""aggregate(sequence(1L, CAST(length(word) AS BIGINT)),
       |  named_struct('pos', CAST(1 AS BIGINT), 'np', CAST(0 AS BIGINT)),
       |  (acc, i) -> CASE WHEN i <> acc.pos THEN acc ELSE named_struct(
       |      'pos', acc.pos + CASE $bestL ELSE CAST(1 AS BIGINT) END,
       |      'np', acc.np + CAST(1 AS BIGINT)) END,
       |  acc -> acc.np)""".stripMargin
  }

  def wordpieceApply(docs: DataFrame, seedMultis: Int = 20,
                     maxPieceLen: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions.typedLit
    val (words, seedPieces) = wordSeedVocab(docs, seedMultis, maxPieceLen)
    val segmented = words
      .withColumn("_wpv", typedLit(seedPieces.map(_._1)))
      .withColumn("n_wp", expr(wpSegExpr(maxPieceLen)))
      .select(col("word"), col("n_wp"), length(col("word")).as("n_chr"))
    withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .join(segmented, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_wp")).cast("long").as("n_wp_tokens"),
        sum(col("n_chr")).cast("long").as("n_chars"))
  }

  /** WordPiece vocab-size sweep — the tokenizer family's SIZING knob
    * (every other serving/build knob has a measured card; a vocab is
    * chosen the same way): arms at top-5/20/40 multi-character pieces
    * are PREFIXES of one ranked sub-piece census (chars always included
    * for coverage), each greedy-folded over the one distinct-word table,
    * reporting exact corpus token counts and the integer compression
    * ratio tokens-per-million-chars. Bigger vocabs buy compression
    * (fewer tokens per char) at resident-vocab cost — the BPE/WordPiece
    * "vocab_size" hyperparameter priced from data instead of folklore.
    */
  def wordpieceVocabReport(docs: DataFrame,
                           multisArms: Seq[Int] = Seq(5, 20, 40),
                           maxPieceLen: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions.typedLit
    require(multisArms.nonEmpty)
    val (words, seedPieces) = wordSeedVocab(docs, multisArms.max, maxPieceLen)
    val chars = seedPieces.filter(_._1.length == 1).map(_._1)
    val multisRanked = seedPieces.filter(_._1.length >= 2).map(_._1)
    multisArms.map { m =>
      words
        .withColumn("_wpv", typedLit(chars ++ multisRanked.take(m)))
        .withColumn("n_wp", expr(wpSegExpr(maxPieceLen)))
        .agg(sum(expr("freq * n_wp")).cast("long").as("n_tokens"),
          sum(expr("freq * length(word)")).cast("long").as("n_chars"))
        .select(lit(f"wp_m$m%02d").as("method"),
          lit(m.toLong).as("n_multis"), col("n_tokens"), col("n_chars"),
          expr("CAST((1000000 * n_tokens) div n_chars AS BIGINT)")
            .as("tokens_per_mchar"))
    }.reduce(_ unionByName _)
  }

  /** TF-IDF keyword extraction, log-free: score = tf × N / df with the
    * raw inverse document frequency instead of its logarithm — the
    * monotone transform preserves every ranking, and division of exact
    * integers is IEEE-deterministic in both engines where `ln` (libm) is
    * not (the same determinism boundary [[rarityStats]] documents). Top
    * `topN` terms per document, ties to the lexicographically smaller
    * term — the per-document keyword signature a curation/retrieval
    * pipeline indexes.
    *
    * Scale shape: one explode → (doc, token) count, one |vocab|-sized df
    * aggregate joined back on token (partial-aggregated both times), one
    * rank window per document bounded at topN downstream. N is a scalar
    * collected once.
    */
  def tfidfTopTerms(docs: DataFrame, topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.count()
    val tf = withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .withColumn("score", col("tf").cast("double") * lit(n) / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
  }

  /** BM25 top-k keyword retrieval (Robertson–Spärck Jones), the ranking
    * function behind every inverted-index search engine — with the usual
    * k1 = 1.2, b = 0.75 re-derived as EXACT integer rationals so the
    * ranking is oracle-checkable: for tf-weight and raw idf,
    *
    *   wtf = tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *       = 44·tf·L / (20·tf·L + 6·L + 18·dl·N)   with avgdl = L/N,
    *   idf = (N−df+½)/(df+½) = (2N−2df+1)/(2df+1)  (log-free, like
    *         [[tfidfTopTerms]] — log preserves no ranking here and libm
    *         rounding differs across engines),
    *
    * and the score is (num1/den1)·(num2/den2): three correctly-rounded
    * IEEE ops over integer operands that stay below 2^53 — bit-identical
    * on any engine. Ties break by doc_id.
    *
    * Scale: the tf table for a bounded query-term set is a filtered
    * explode (the inverted-index posting lists for exactly those terms —
    * no full-vocabulary index materialized), corpus stats ride a 1-row
    * broadcast, and the per-term top-k window partitions by term; for
    * unbounded term sets swap the window for the bounded single-pass
    * [[graft.functions.TopKAggregator]] as `sim_topk_brute_agg` does.
    */
  /** THE BM25 score expression (over columns tf, df, dl, n_docs,
    * corpus_len) — the single definition [[bm25TopK]], [[hybridRrfTopK]]
    * and [[invertedIndexSearch]] all score with, so a k1/b retune reaches
    * every consumer (they'd silently diverge as inlined copies).
    */
  private[graft] val bm25ScoreSql: String =
    "(CAST(44 * tf * corpus_len AS DOUBLE) " +
      " / CAST(20 * tf * corpus_len + 6 * corpus_len + 18 * dl * n_docs AS DOUBLE)) " +
      "* (CAST(2 * n_docs - 2 * df + 1 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE))"

  /** The raw-idf TF·IDF score (over tf, df, n_docs) — [[tfidfTopK]]'s and
    * [[hybridRrfTopK]]'s shared second ranking signal. */
  private[graft] val tfidfScoreSql: String =
    "CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE)"

  def bm25TopK(docs: DataFrame, terms: Seq[String], topN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dl = withTokens(docs)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("corpus_len"))
    val tf = withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("term")).join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("score", expr(bm25ScoreSql))
    val w = Window.partitionBy(col("term")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("term"), col("rank").cast("int").as("rank"), col("doc_id"),
        col("tf"), col("df"), col("dl"), col("score"))
  }

  /** Log-free TF·IDF retrieval (score = tf·N/df, the raw-idf monotone
    * transform the repo's keyword extractor uses) — [[bm25TopK]]'s
    * length-normalization-free sibling: the same [[tfidfScoreSql]] signal
    * [[hybridRrfTopK]] fuses as its second ranker, served standalone.
    * Exact integer products under one deterministic double division. */
  def tfidfTopK(docs: DataFrame, terms: Seq[String], topN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("term")).orderBy(col("score").desc, col("doc_id"))
    tf.join(df, Seq("term")).crossJoin(broadcast(nDocs))
      .withColumn("score", expr(tfidfScoreSql))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("term"), col("rank").cast("int").as("rank"), col("doc_id"),
        col("score"))
  }

  /** Hybrid retrieval by reciprocal-rank fusion (RRF, Cormack et al.):
    * two rankers' top lists fused by Σ ⌊10⁶/(60+rank)⌋ per (query, doc) —
    * the standard fusion of heterogeneous retrievers (here BM25's
    * length-normalized ranking and raw TF·IDF's), exact integers so the
    * fused ranking is bit-stable. Docs found by only one ranker still
    * score (full outer union); flags record which side surfaced each hit.
    * Scale: both rankers are posting-list aggregations; the fusion joins
    * two (terms×topN)-row lists — bounded. */
  def hybridRrfTopK(docs: DataFrame, terms: Seq[String],
                    perRanker: Int = 10, topN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE posting build shared by both rankers — a real hybrid retriever
    // serves both scores from the same index; calling the two standalone
    // ops would rebuild the tokenize+explode postings per ranker (the
    // repeated-scan sweep reads that as 7 corpus scans). The joined
    // posting table is (terms × matching docs)-bounded, so the cut is tiny.
    val dl = withTokens(docs)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("corpus_len"))
    val tf = withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val postings = tf
      .join(tf.groupBy(col("term")).agg(count(lit(1)).as("df")), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .localCheckpoint(true)
    val wBm = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id"))
    val bm = postings
      .withColumn("score", expr(bm25ScoreSql))
      .withColumn("rank_bm25", row_number().over(wBm))
      .filter(col("rank_bm25") <= perRanker)
      .select(col("term"), col("doc_id"), col("rank_bm25"))
    val ti = postings
      .withColumn("score", expr(tfidfScoreSql))
      .withColumn("rank_tfidf", row_number().over(wBm))
      .filter(col("rank_tfidf") <= perRanker)
      .select(col("term"), col("doc_id"), col("rank_tfidf"))
    val fused = bm.join(ti, Seq("term", "doc_id"), "full_outer")
      .withColumn("rrf_e6",
        coalesce(expr("1000000 div (60 + rank_bm25)"), lit(0L))
          + coalesce(expr("1000000 div (60 + rank_tfidf)"), lit(0L)))
    val w = Window.partitionBy(col("term")).orderBy(col("rrf_e6").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("term"), col("rank").cast("int").as("rank"), col("doc_id"),
        col("rrf_e6"),
        when(col("rank_bm25").isNotNull, 1).otherwise(0).as("in_bm25"),
        when(col("rank_tfidf").isNotNull, 1).otherwise(0).as("in_tfidf"))
  }

  /** Collocation extraction by PMI proxy: adjacent pairs ranked by
    * T·c(xy) / (c(x)·c(y)) — the log-free monotone transform of pointwise
    * mutual information (log preserves no ranking; libm rounding differs
    * across engines), with a min-count floor because PMI famously
    * overweights hapax pairs. The score is one correctly-rounded double
    * division of two exact integer products (T·c(xy) and c(x)·c(y) both
    * < 2^53 through ~10^13-token corpora at the floored counts), so the
    * ranking is bit-identical cross-engine. This is the phrase-mining
    * pass (new-terminology surfacing, tokenizer-vocab candidates) a
    * corpus pipeline runs beside [[bpePairCensus]]'s raw frequency.
    *
    * Scale: two map-side-combined aggregations (unigrams, bigrams), two
    * hash joins keyed on single tokens, a 1-row broadcast total, and a
    * TakeOrdered top-k — no all-pairs step, nothing driver-side.
    */
  def collocationTopK(docs: DataFrame, minCount: Long = 5L,
                      topN: Int = 20): DataFrame = {
    val toks = withTokens(docs).select(col("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bi = toks.select(explode(expr(
        "transform(arrays_zip(slice(toks, 1, greatest(size(toks)-1, 0)), " +
          "slice(toks, 2, greatest(size(toks)-1, 0))), " +
          "p -> named_struct('w1', p['0'], 'w2', p['1']))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val biCnt = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
    val t = bi.agg(count(lit(1)).as("t_bigrams"))
    biCnt.filter(col("c_xy") >= minCount)
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_x"), Seq("w1"))
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_y"), Seq("w2"))
      .crossJoin(broadcast(t))
      .withColumn("score",
        expr("CAST(t_bigrams * c_xy AS DOUBLE) / CAST(c_x * c_y AS DOUBLE)"))
      .orderBy(col("score").desc, col("w1"), col("w2"))
      .limit(topN)
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"), col("score"))
  }

  /** Persisted inverted-index lifecycle — the text-retrieval sibling of
    * the IVF index tables ([[graft.ops.Similarity.ivfIndexBuild]]): the
    * postings (term, doc_id) → tf and the doc-length sidecar live as
    * versioned [[graft.stages.MergeTable]]s, a new corpus batch is an
    * UPSERT of just its own postings (delta-sized, idempotent on replay —
    * re-adding a batch rewrites identical rows), and search is served
    * ENTIRELY from the tables: the query-term filter on the postings
    * table IS the posting-list read, corpus stats ride the doc-length
    * sidecar, and scoring is [[bm25TopK]]'s exact integer-rational BM25.
    * An incrementally-built index must therefore answer bit-identically
    * to a direct scan of the whole corpus — the oracle checks exactly
    * that.
    */
  def invertedIndexBuild(docs: DataFrame,
                         postings: graft.stages.MergeTable,
                         docStats: graft.stages.MergeTable): Unit = {
    postings.replace(termPostings(docs))
    docStats.replace(docLengths(docs))
  }

  def invertedIndexAdd(docsNew: DataFrame,
                       postings: graft.stages.MergeTable,
                       docStats: graft.stages.MergeTable): Unit = {
    postings.upsert(termPostings(docsNew))
    docStats.upsert(docLengths(docsNew))
  }

  def invertedIndexSearch(spark: org.apache.spark.sql.SparkSession,
                          postings: graft.stages.MergeTable,
                          docStats: graft.stages.MergeTable,
                          terms: Seq[String], topN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val postingsSchema = StructType(Seq(StructField("term", StringType),
      StructField("doc_id", LongType), StructField("tf", LongType)))
    val statsSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("dl", LongType)))
    val dl = docStats.read(spark, statsSchema)
    val corpus = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("corpus_len"))
    val tf = postings.read(spark, postingsSchema)
      .filter(col("term").isin(terms: _*))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("term")).join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("score", expr(bm25ScoreSql))
    val w = Window.partitionBy(col("term")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("term"), col("rank").cast("int").as("rank"), col("doc_id"),
        col("tf"), col("df"), col("dl"), col("score"))
  }

  private def termPostings(docs: DataFrame): DataFrame =
    withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))

  private def docLengths(docs: DataFrame): DataFrame =
    withTokens(docs)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"))

  /** Token-rarity signals — the log-free stand-in for a language-model
    * quality score: each document's tokens joined to the CORPUS frequency
    * table, then per-doc mean and min frequency (a document full of
    * corpus-rare tokens is gibberish or treasure; either way a mix
    * planner wants it surfaced). Integer frequency sums with one final
    * double division — log-based perplexity proxies are deliberately
    * avoided because libm rounding differs across engines and would break
    * the oracle hash.
    */
  /** 2-gram corpus-likelihood proxy — the SEQUENTIAL extension of
    * [[rarityStats]] (the CCNet/KenLM-style fluency filter, without a
    * model): every adjacent token pair scored by its corpus-wide
    * frequency. Low mean/min transition frequency marks unnatural
    * sequences — gibberish, shuffled text, OCR noise — whose tokens may
    * each be common while the TRANSITIONS are not, which token-level
    * rarity cannot see. Outputs are integer counts plus one exact double
    * division (the [[rarityStats]] convention), so the oracle compare is
    * exact. Docs with fewer than two tokens have no transitions and drop
    * out (explode of an empty array); the slice length is clamped to >= 0
    * so that holds STRUCTURALLY for any tokenizer (a regex split can
    * yield a genuinely empty array, where an unclamped size-1 slice
    * length would throw at runtime instead of dropping the doc).
    *
    * Scale: per-row bigram construction (no shuffle), one map-side-combined
    * hash aggregation for the corpus frequency table, and a join back on
    * the bigram key — the same shape as the token frequency path.
    */
  def bigramLmStats(docs: DataFrame): DataFrame = {
    val withBi = withTokens(docs).withColumn("bigram",
      explode(expr(
        "transform(arrays_zip(slice(toks, 1, greatest(size(toks)-1, 0)), " +
          "slice(toks, 2, greatest(size(toks)-1, 0))), " +
          "p -> concat(p['0'], ' ', p['1']))")))
    val freq = withBi.groupBy(col("bigram")).agg(count(lit(1)).as("freq"))
    withBi.select(col("doc_id"), col("bigram"))
      .join(freq, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("freq")).as("freq_sum"),
        min(col("freq")).as("min_bigram_freq"),
        count(when(col("freq") === 1, 1)).as("n_singletons"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("freq_sum").cast("double") / col("n_bigrams")).as("mean_bigram_freq"),
        col("min_bigram_freq"), col("n_singletons"))
  }

  /** Corpus-trained quality classifier — MODEL INFERENCE shape, not another
    * heuristic: a per-token vote table is learned from the corpus (the
    * heuristic [[qualityScore]] flag acts as the weak-supervision teacher,
    * the role a curated seed set plays in CCNet/fastText quality filters),
    * then every document is scored by summing its tokens' votes. A token
    * votes +1 when its rate among quality-doc tokens exceeds its rate among
    * junk-doc tokens — compared by INTEGER cross-multiplication
    * (`n_q·t_j ? n_j·t_q`), never a float ratio, so train and apply are
    * bit-exact cross-engine. Prediction = vote majority (score > 0).
    *
    * Scale shape: train = one token explode → map-side-combined
    * `groupBy(token)` (vocabulary-sized output, orders below corpus size) +
    * a 1-row total broadcast; apply = the token stream joined to the vote
    * table (vocabulary-keyed equi-join; AQE broadcasts when the vocab
    * fits) + one per-doc aggregation. The token stream feeds train AND
    * apply — at corpus scale persist it once (the [[decontaminationReport]]
    * scratch-stage pattern) instead of re-tokenizing; at oracle scale the
    * double pass is cheaper than the materialization. Cross-products are
    * `long×long`; beyond ~1e9 tokens per class move the comparison to
    * decimal(38,0) (documented determinism boundary).
    */
  def qualityVoteClassifier(docs: DataFrame): DataFrame = {
    // two lineage cuts pin the pass count at the algorithm's honest three
    // (label, train, score): `labels` (narrow doc_id+flag) is referenced by
    // both the token stream and the final join, and `tokenCounts`
    // (vocabulary-sized) by both the totals and the votes — uncut, each
    // reference replayed the teacher-heuristic + tokenize subtree
    // (measured 11 base scans in the plan)
    val labels = qualityScore(docs).select(col("doc_id"), col("is_quality"))
      .localCheckpoint(true)
    val toks = withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .join(labels, Seq("doc_id"))
    val tokenCounts = toks.groupBy(col("token"))
      .agg(count(when(col("is_quality"), 1)).as("n_q"),
        count(when(!col("is_quality"), 1)).as("n_j"))
      .localCheckpoint(true)
    val totals = tokenCounts.agg(sum(col("n_q")).as("t_q"), sum(col("n_j")).as("t_j"))
    val votes = tokenCounts.crossJoin(broadcast(totals))
      .select(col("token"),
        when(col("n_q") * col("t_j") > col("n_j") * col("t_q"), lit(1))
          .when(col("n_q") * col("t_j") < col("n_j") * col("t_q"), lit(-1))
          .otherwise(lit(0)).as("vote"))
    toks.join(votes, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens_scored"),
        sum(col("vote")).cast("long").as("vote_score"))
      .join(labels, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens_scored"), col("vote_score"),
        (col("vote_score") > 0).as("predicted_quality"), col("is_quality"))
  }

  def rarityStats(docs: DataFrame): DataFrame = {
    val freq = tokenFrequencies(docs)
    withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .join(freq, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("freq")).as("freq_sum"),
        min(col("freq")).as("min_token_freq"))
      .select(col("doc_id"), col("n_tokens"),
        (col("freq_sum").cast("double") / col("n_tokens")).as("mean_token_freq"),
        col("min_token_freq"))
  }

  /** χ² (chi-square) token↔class feature selection (the Manning-IR
    * alternative to mutual information, chosen because it is LOG-FREE and
    * therefore exact cross-engine): for each (token, class) presence
    * 2×2 table — N11 docs of the class containing the token, N10/N01/N00
    * derived from the marginals — the statistic
    * N·(N11·N00 − N10·N01)² / (df_w·(N−df_w)·n_c·(N−n_c)) rides as a
    * 10⁴-scaled integer; intermediates go through decimal(38,0)
    * (HUGEINT on the oracle side) because the squared delta times N·10⁴
    * overflows int64 beyond ~5k docs. Low-df tokens are floored out
    * (χ² is unreliable below ~5 observations) and all-docs tokens are
    * dropped (zero denominator).
    *
    * Scale: presence lists are distinct (doc, token) pairs — the TF-IDF
    * posting shape; marginals are one combinable count each; the class
    * table and scalar total are broadcast. No window, no second pass.
    */
  def chi2FeatureSelection(docs: DataFrame, classCol: String = "lang",
                           minDf: Long = 5L, topN: Int = 20): DataFrame = {
    val d = withTokens(docs)
      .select(col("doc_id"), col(classCol).as("cls"),
        explode(array_distinct(col("toks"))).as("token"))
    val nTotal = docs.agg(count(lit(1)).as("n_docs"))
    val nClass = docs.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_c"))
    val dfW = d.groupBy(col("token")).agg(count(lit(1)).as("df_w"))
    d.groupBy(col("token"), col("cls")).agg(count(lit(1)).as("df_wc"))
      .join(dfW, Seq("token"))
      .join(broadcast(nClass), Seq("cls"))
      .crossJoin(broadcast(nTotal))
      .filter(col("df_w") >= minDf && col("df_w") < col("n_docs"))
      // delta in decimal(38,0) end-to-end: the raw int64 products
      // df_wc·(n_docs−…) overflow once n_docs exceeds ~3e9, undercutting
      // the 100 TB posture even though the chi2_e4 numerator was already
      // decimal-safe (advisor r11)
      .withColumn("delta", expr(
        """CAST(df_wc AS DECIMAL(38,0))
             * (CAST(n_docs AS DECIMAL(38,0)) - CAST(n_c AS DECIMAL(38,0))
                - (CAST(df_w AS DECIMAL(38,0)) - CAST(df_wc AS DECIMAL(38,0))))
           - (CAST(df_w AS DECIMAL(38,0)) - CAST(df_wc AS DECIMAL(38,0)))
             * (CAST(n_c AS DECIMAL(38,0)) - CAST(df_wc AS DECIMAL(38,0)))"""))
      .withColumn("chi2_e4", expr(
        """(10000 * CAST(n_docs AS DECIMAL(38,0)) * CAST(delta AS DECIMAL(38,0)) * CAST(delta AS DECIMAL(38,0)))
           div (CAST(df_w AS DECIMAL(38,0)) * (n_docs - df_w) * n_c * (n_docs - n_c))"""))
      .select(col("token"), col("cls"), col("df_wc"), col("df_w"),
        col("n_c"), col("chi2_e4"))
      .orderBy(col("chi2_e4").desc, col("token"), col("cls"))
      .limit(topN)
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are the
    * maximal stopword-free token runs (gaps-and-islands: pos −
    * row_number over non-stop tokens per doc), each word scores
    * deg/freq where deg sums the lengths of the phrases its occurrences
    * sit in, and a phrase scores the sum of its member-word scores.
    * Scores ride as milli-scaled integers ((1000·deg) div freq — both
    * engines truncate identically on positive operands), so the whole
    * pipeline is exact. Top-`topN` phrases per doc, ties broken by first
    * occurrence.
    *
    * Scale: every shuffle is keyed by doc_id or (doc_id, token); per-doc
    * work is linear in document length. The doc-partitioned windows never
    * see more rows than the longest document.
    */
  /** Gopher-style quality-rule flags (Rae et al. 2021, arXiv:2112.11446
    * §A1.1, adapted to the word-level corpus — the line-shape rules
    * degenerate on single-line documents and are omitted): per-document
    * booleans for the five word-level rules a web-scale filter ships.
    *
    *   - word count within [minWords, maxWords];
    *   - mean word length within [3, 10] chars — checked as the INTEGER
    *     inequality `3·n_tokens ≤ word_chars ≤ 10·n_tokens` (word_chars =
    *     n_chars − separators), so no division ever happens;
    *   - ≥ 80% of words contain an alphabetic character (5·n_alpha ≥
    *     4·n_tokens);
    *   - at least 2 DISTINCT words from the required-stopword list (the
    *     Gopher "stop word" rule — catches keyword-stuffing pages);
    *   - symbol-to-word ratio ≤ 0.1 for `#` / `...` (10·n_sym ≤ n_tokens).
    *
    * Pure per-row column algebra — zero shuffles, fuses into any scan; all
    * comparisons are integer, so the flags are exact cross-engine.
    */
  def gopherFlags(docs: DataFrame,
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val stopList = stopwords.toMap.apply("en").map(w => s"'$w'").mkString(", ")
    withTokens(docs)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("word_chars",
        (length(col("text")) - size(col("toks")) + 1).cast("long"))
      .withColumn("n_alpha",
        expr("CAST(size(filter(toks, t -> t RLIKE '[a-z]')) AS BIGINT)"))
      .withColumn("n_stop_distinct", expr(
        s"CAST(size(array_intersect(array_distinct(toks), array($stopList))) AS BIGINT)"))
      .withColumn("n_sym", expr(
        """CAST(length(text) - length(replace(text, '#', ''))
           + (length(text) - length(replace(text, '...', ''))) div 3 AS BIGINT)"""))
      .withColumn("fail_word_count",
        col("n_tokens") < minWords || col("n_tokens") > maxWords)
      .withColumn("fail_mean_word_len",
        col("word_chars") < lit(3) * col("n_tokens") ||
          col("word_chars") > lit(10) * col("n_tokens"))
      .withColumn("fail_alpha_ratio",
        lit(5) * col("n_alpha") < lit(4) * col("n_tokens"))
      .withColumn("fail_stopword", col("n_stop_distinct") < 2)
      .withColumn("fail_symbol_ratio", lit(10) * col("n_sym") > col("n_tokens"))
  }

  /** Per-language census over [[gopherFlags]]: how many documents each rule
    * rejects, and how many survive all five — the acceptance readout a
    * filtering run reports before committing thresholds. One bounded
    * groupBy(lang); the flags themselves never shuffle.
    */
  def gopherRulesCensus(docs: DataFrame): DataFrame = {
    val f = gopherFlags(docs)
    def nf(c: String) = count(when(col(c), lit(1))).as(c.replace("fail_", "n_fail_"))
    f.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        nf("fail_word_count"), nf("fail_mean_word_len"), nf("fail_alpha_ratio"),
        nf("fail_stopword"), nf("fail_symbol_ratio"),
        count(when(!col("fail_word_count") && !col("fail_mean_word_len") &&
          !col("fail_alpha_ratio") && !col("fail_stopword") &&
          !col("fail_symbol_ratio"), lit(1))).as("n_pass_all"))
      .orderBy(col("lang"))
  }

  /** Bigram-LM surprisal in INTEGER BITS — the CCNet/KenLM perplexity
    * filter made hash-exact without a single float log: with add-one
    * smoothing, p(v|w) = (c(wv)+1)/(c(w)+V), and the per-token surprisal
    * −log₂p quantizes to `floor(log₂((c(w)+V) div (c(wv)+1)))`, computed
    * exactly as `length(bin(a div b)) − 1` (for integers a ≥ b ≥ 1,
    * `floor(log₂(a/b)) == floor(log₂(a div b))`: if 2^k ≤ a/b < 2^(k+1)
    * then 2^k ≤ a div b ≤ a/b, so the binary length is k+1 in both). The
    * result is within 1 bit/token of true cross-entropy — more than
    * enough resolution to rank fluency — and bit-identical cross-engine.
    *
    * Unlike [[bigramLmStats]] (raw corpus bigram frequency), this scores
    * the CONDITIONAL transition probability, so a rare-but-predictable
    * continuation is cheap while a common token in the wrong context is
    * expensive — the actual LM-filter semantics.
    *
    * Scale: unigram/bigram count tables are groupBy aggregations (map-side
    * combined); scoring joins are equi-joins keyed by the n-gram — plain
    * shuffle hash joins, no corpus broadcast anywhere; the vocab size is
    * the only broadcast (1 row). Per-doc output: (doc_id, lang,
    * n_bigrams, bits_sum).
    */
  def lmSurprisalDocs(docs: DataFrame): DataFrame = {
    val toks = withTokens(docs)
    val bi = toks.select(col("doc_id"), col("lang"), explode(expr(
        """CASE WHEN size(toks) < 2 THEN array()
           ELSE transform(sequence(1, size(toks) - 1),
                  i -> struct(element_at(toks, i) AS w, element_at(toks, i + 1) AS v))
           END""")).as("b"))
      .select(col("doc_id"), col("lang"), col("b.w").as("w"), col("b.v").as("v"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val vocab = uni.agg(count(lit(1)).as("vsz"))
    val big = bi.groupBy(col("w"), col("v")).agg(count(lit(1)).as("cwv"))
    bi.join(big, Seq("w", "v")).join(uni, Seq("w"))
      .crossJoin(broadcast(vocab))
      .withColumn("bits",
        expr("CAST(length(bin((cw + vsz) div (cwv + 1))) - 1 AS BIGINT)"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("bits_sum"))
  }

  /** Per-language surprisal census over [[lmSurprisalDocs]]: mean
    * bits/token (1e2-scaled truncated integer) and the worst single
    * document's mean — the numbers a perplexity-threshold decision reads.
    */
  def lmSurprisalCensus(docs: DataFrame): DataFrame =
    lmSurprisalDocs(docs)
      .withColumn("doc_bits_e2", expr("100 * bits_sum div n_bigrams"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        sum(col("bits_sum")).as("bits_sum"),
        expr("100 * sum(bits_sum) div sum(n_bigrams)").as("mean_bits_e2"),
        max(col("doc_bits_e2")).as("worst_doc_bits_e2"))
      .orderBy(col("lang"))

  /** Zipf-slope census: least-squares slope of log₂(freq) on log₂(rank)
    * over the top-N terms per language — natural language sits near −1
    * (Zipf's law); templated/generated text drifts flat (near 0, uniform
    * boilerplate) or cliff-steep. The corpus-shape audit a crawl ships
    * next to [[gopherRulesCensus]].
    *
    * Exactness: both logs quantize to whole bits via the binary-length
    * kernel (no float log), and the slope is the cross-multiplied exact
    * least-squares form (n·Σxy − ΣxΣy over n·Σx² − (Σx)², sign-split
    * truncating 1e4 division) — bit-identical cross-engine. Integer bits
    * are coarse per point but the fit over 7 rank octaves recovers the
    * exponent to ~0.1, enough to separate natural from degenerate.
    *
    * Scale: the corpus contracts to the (lang, term) frequency table first
    * (map-side combined); the per-lang rank window runs on that contracted
    * table (vocab-sized partitions — the [[rakeKeywords]] shape), and the
    * regression is a bounded |langs|-row aggregate over ≤N points each.
    */
  def zipfSlopeCensus(docs: DataFrame, topN: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = withTokens(docs)
      .select(col("lang"), explode(col("toks")).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("f"))
    val w = Window.partitionBy(col("lang")).orderBy(col("f").desc, col("w"))
    freq.withColumn("r", row_number().over(w))
      .filter(col("r") <= topN)
      .select(col("lang"),
        expr("CAST(length(bin(r)) - 1 AS BIGINT)").as("x"),
        expr("CAST(length(bin(f)) - 1 AS BIGINT)").as("y"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sx2"))
      .withColumn("num", lit(10000L) * (col("n_terms") * col("sxy") - col("sx") * col("sy")))
      .withColumn("den", col("n_terms") * col("sx2") - col("sx") * col("sx"))
      .select(col("lang"), col("n_terms"),
        expr("""CASE WHEN num < 0 THEN -((-num) div den)
                     ELSE num div den END""").as("slope_e4"))
      .orderBy(col("lang"))
  }

  def rakeKeywords(docs: DataFrame, topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stopList = stopwords.toMap.apply("en").map(w => s"'$w'").mkString(", ")
    val toks = withTokens(docs)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
    val wGrp = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val member = toks.filter(not(expr(s"tok IN ($stopList)")))
      .withColumn("grp", col("pos") - row_number().over(wGrp))
    val phrases = member.groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("n_words"), min(col("pos")).as("ppos"),
        concat_ws(" ",
          expr("transform(sort_array(collect_list(struct(pos, tok))), x -> x.tok)"))
          .as("phrase"))
    val wordScores = member
      .join(phrases.select(col("doc_id"), col("grp"), col("n_words")),
        Seq("doc_id", "grp"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(expr("(1000 * sum(n_words)) div count(1)").as("wscore"))
    val scored = member.join(wordScores, Seq("doc_id", "tok"))
      .groupBy(col("doc_id"), col("grp"))
      .agg(sum(col("wscore")).as("score_milli"))
      .join(phrases, Seq("doc_id", "grp"))
    val wTop = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_milli").desc, col("ppos"))
    scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= topN)
      .select(col("doc_id"), col("rank"), col("phrase"),
        col("n_words"), col("score_milli"))
  }
}
