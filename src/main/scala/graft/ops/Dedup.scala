package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication for a training-data pipeline: exact, MinHash+LSH,
  * SimHash, and exact n-gram Jaccard — all over the `documents` table shape
  * `(doc_id long, text string)`.
  *
  * Cross-engine hash primitive: `md5long(s)` = first 15 hex chars of md5 as
  * a 60-bit integer. md5 is identical everywhere, so every downstream
  * integer computation (MinHash permutations, SimHash bits, LSH band keys)
  * is exactly reproducible by the DuckDB oracle — no engine-private hash
  * (xxhash/murmur) appears anywhere.
  *
  * Scale design (100 TB): the naive all-pairs shingle join explodes
  * quadratically on hot shingles, so the production path is MinHash → LSH
  * band join: cost is O(docs × bands) rows through one shuffle, and only
  * genuine candidates (a whole band of the signature equal) meet in the
  * join. Candidate verification re-checks exact Jaccard on the hashed
  * shingle sets, so LSH false positives never reach the output. The exact
  * shingle-join variant is kept for corpora where shingle frequency is
  * bounded (here: 5-word shingles are near-unique) and as the oracle for
  * LSH recall.
  */
object Dedup {

  /** 2^31 - 1, the classic MinHash permutation modulus. */
  val P: Long = 2147483647L

  val defaultShingle = 3
  val numHashes = 18
  val bands = 6
  val rowsPerBand = 3

  /** tokens → distinct hashed word-n-gram shingles (60-bit, then mod P for
    * MinHash). Rows with fewer than `n` tokens are dropped (no shingles).
    */
  def withShingleHashes(docs: DataFrame, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // fused native form of: array_distinct(transform(sequence(0, size-n),
    //   i -> conv(substring(md5(concat_ws(' ', slice(toks,i+1,n))),1,15),16,10) % P))
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= n)
      .withColumn("hbase", expr(s"graft_shingle_hashes(toks, $n, true)"))
  }

  /** MinHash signature: sig[i] = min over shingles of (a_i·h + b_i mod P),
    * a_i/b_i fixed LCG-style constants — one array column, no shuffle.
    */
  def withMinhashSignature(shingled: DataFrame, k: Int = numHashes): DataFrame = {
    graft.functions.GraftFunctions.register(shingled.sparkSession)
    // native equivalent of: transform(sequence(0, k-1), i -> array_min(
    //   transform(hbase, h -> ((1103515245*(i+1)) % P * h + 12345 + 769*i) % P)))
    shingled.withColumn("sig", expr(s"graft_minhash(hbase, $k)"))
  }

  /** LSH candidate pairs + exact-Jaccard verification.
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ tau.
    */
  def minhashLshPairs(docs: DataFrame, n: Int = defaultShingle,
                      tau: Double = 0.5): DataFrame = {
    val sigs = withMinhashSignature(withShingleHashes(docs, n))
      .select(col("doc_id"), col("hbase"), col("sig"))
    val bandRows = bandRowsOf(sigs)
    val a = bandRows.as("a")
    val b = bandRows.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(candidates, sigs.select(col("doc_id"), col("hbase")), tau)
  }

  /** LSH calibration report — the tuning table an operator reads before
    * picking tau and band geometry: over the pairs the banding actually
    * surfaces, the MinHash-ESTIMATED Jaccard (matching signature
    * components / k) is thresholded against the EXACT shingle Jaccard at
    * a ladder of taus, counting estimator-pass, exact-pass, and agreement
    * — the estimator's precision/recall curve on real candidates. Bounded:
    * |candidates| scored pairs fan out ×|taus| only in the final tiny
    * aggregate; signatures and shingle sets ride the same two joins
    * [[verifyJaccard]] pays, nothing extra touches the corpus.
    */
  def lshCalibrationSweep(docs: DataFrame, n: Int = defaultShingle,
                          taus: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)): DataFrame = {
    val sigs = withMinhashSignature(withShingleHashes(docs, n))
      .select(col("doc_id"), col("hbase"), col("sig"))
    val bandRows = bandRowsOf(sigs)
    val candidates = bandRows.as("a").join(bandRows.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val scored = candidates
      .join(sigs.select(col("doc_id").as("doc_a"),
        col("hbase").as("h_a"), col("sig").as("s_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"),
        col("hbase").as("h_b"), col("sig").as("s_b")), Seq("doc_b"))
      .withColumn("n_match", expr(
        s"size(filter(sequence(1, $numHashes), i -> s_a[i - 1] = s_b[i - 1]))"))
      .withColumn("est", col("n_match").cast("double") / numHashes)
      .withColumn("n_inter", size(array_intersect(col("h_a"), col("h_b"))))
      .withColumn("exact", col("n_inter").cast("double") /
        (size(col("h_a")) + size(col("h_b")) - col("n_inter")))
    scored
      .select(col("est"), col("exact"),
        explode(expr(s"array(${taus.map(t => s"${t}D").mkString(", ")})")).as("tau"))
      .groupBy(col("tau"))
      .agg(count(lit(1)).as("n_candidates"),
        count(when(col("est") >= col("tau"), 1)).as("n_est_pass"),
        count(when(col("exact") >= col("tau"), 1)).as("n_exact_pass"),
        count(when(col("est") >= col("tau") && col("exact") >= col("tau"), 1))
          .as("n_agree"))
  }

  /** Exact all-pairs n-gram Jaccard via inverted shingle index — the
    * bounded-frequency path (long shingles ⇒ tiny postings lists).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 5, tau: Double = 0.5): DataFrame = {
    val sh = withShingleHashes(docs, n).select(col("doc_id"), col("hbase"))
    val posting = sh.select(col("doc_id"), explode(col("hbase")).as("h"))
    val inter = posting.as("a")
      .join(posting.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    val sizes = sh.select(col("doc_id"), size(col("hbase")).as("n_sh"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "size_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "size_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("size_a") + col("size_b") - col("n_inter")))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Prefix-filtered set-similarity join (the AllPairs/PPJoin candidate
    * principle, Bayardo et al. "Scaling Up All Pairs Similarity Search" /
    * Xiao et al. PPJoin): shingle-set Jaccard ≥ τ pairs WITHOUT a df cap
    * and with ZERO false negatives by construction — the exact complement
    * to [[minhashLshPairs]] (probabilistic recall) and
    * [[ngramJaccardPairs]] (full inverted index). Each document's
    * distinct shingle hashes are ordered rarest-first (global df asc,
    * hash asc — one canonical order corpus-wide); J(A,B) ≥ τ implies
    * |A∩B| ≥ ⌈τ·|A|⌉, so two qualifying sets MUST share an element inside
    * their first |T| − ⌈τ·|T|⌉ + 1 elements (the prefix lemma: disjoint
    * prefixes leave too few remaining elements to reach the overlap
    * bound). Only prefixes are indexed — and because prefixes keep the
    * RAREST shingles, the boilerplate postings that blow up a full
    * inverted index (df² pairs per common shingle) never enter the join;
    * the AllPairs length filter (τ·max ≤ min of the two set sizes) kills
    * size-discordant collisions inside the join condition. τ rides as
    * the rational tauNum/tauDen so ⌈τ·n⌉ = (tauNum·n + tauDen − 1) div
    * tauDen stays integer-exact cross-engine (a float 0.6·n can straddle
    * the ceiling).
    *
    * Scale shape: one hash-keyed df join + a per-doc window for ranks,
    * the prefix self-join (Σ_h prefix-df² — bounded by rarity), and a
    * doc-keyed join-back of the bounded candidates onto the full sets for
    * the exact array_intersect verify. No all-pairs stage; the
    * no-false-negative property is spec-proven against brute force.
    * Massive EXACT-duplicate clusters remain pairwise-quadratic in the
    * OUTPUT by definition — collapse them first with
    * [[exactDuplicateGroups]] when a corpus has them.
    */
  def prefixFilterPairs(docs: DataFrame, n: Int = defaultShingle,
                        tauNum: Int = 3, tauDen: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sets = withShingleHashes(docs, n).select(col("doc_id"), col("hbase"))
    val toks = sets.select(col("doc_id"), size(col("hbase")).as("sz"),
      explode(col("hbase")).as("h"))
    val dfT = toks.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val ranked = toks.join(dfT, Seq("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
    val pre = ranked
      .filter(col("rn") <= col("sz") - expr(s"($tauNum * sz + ${tauDen - 1}) div $tauDen") + 1)
      .select(col("doc_id"), col("sz"), col("h"))
    // length filter (the AllPairs companion bound): J >= tau forces
    // tau·max(|A|,|B|) <= min(|A|,|B|), so size-discordant prefix
    // collisions die inside the join condition, before the distinct
    val cand = pre.as("a")
      .join(pre.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * tauNum <= col("b.sz") * tauDen &&
          col("b.sz") * tauNum <= col("a.sz") * tauDen)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2")).distinct()
    val s1 = sets.select(col("doc_id").as("id1"), col("hbase").as("s1"))
    val s2 = sets.select(col("doc_id").as("id2"), col("hbase").as("s2"))
    cand.join(s1, Seq("id1")).join(s2, Seq("id2"))
      .withColumn("inter_sz", size(array_intersect(col("s1"), col("s2"))))
      .withColumn("union_sz", size(col("s1")) + size(col("s2")) - col("inter_sz"))
      .filter(col("inter_sz") * tauDen >= col("union_sz") * tauNum)
      .select(col("id1"), col("id2"), col("inter_sz"), col("union_sz"),
        (col("inter_sz").cast("double") / col("union_sz")).as("jaccard"))
  }

  /** Asymmetric CONTAINMENT near-dup pairs: C(A→B) = |A∩B| / |A| over the
    * same exact shingle machinery as [[ngramJaccardPairs]], emitted as
    * DIRECTED pairs. This is the subset case symmetric Jaccard
    * structurally misses — a 20-shingle quote fully embedded in a
    * 500-shingle page has J ≈ 0.04 but C = 1.0 — and the signal that
    * catches quotations, boilerplate-wrapped copies, and doc-in-doc
    * duplication. Same inverted-index shape (posting join + one divide);
    * the directed join doubles candidates versus the `<`-canonical form,
    * nothing more.
    */
  def ngramContainmentPairs(docs: DataFrame, n: Int = 5,
                            tau: Double = 0.8): DataFrame = {
    val sh = withShingleHashes(docs, n).select(col("doc_id"), col("hbase"))
    val posting = sh.select(col("doc_id"), explode(col("hbase")).as("h"))
    val inter = posting.as("a")
      .join(posting.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_small"), col("b.doc_id").as("doc_big"))
      .agg(count(lit(1)).as("n_inter"))
    val sizes = sh.select(col("doc_id"), size(col("hbase")).as("n_sh"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_small"), Seq("doc_small"))
      .withColumn("containment", col("n_inter").cast("double") / col("n_sh"))
      .filter(col("containment") >= tau)
      .select(col("doc_small"), col("doc_big"), col("n_inter"),
        col("n_sh"), col("containment"))
  }

  /** Exact-substring duplication census — the "dedup exact substrings"
    * signal (Lee et al. 2022, Deduplicating Training Data Makes Language
    * Models Better) at a scalable ANCHOR grain. Indexing every position's
    * L-gram is a corpus×length posting (suffix-array territory); instead
    * only CONTENT-DEFINED anchor positions are indexed — window rolling
    * hash ≡ 0 mod `d`, the CDC boundary condition (`graft_anchors`, the
    * incremental O(len) kernel) — ≈1/d of positions. Identical text
    * selects identical anchors, so a shared run of length `r ≥ L` yields
    * shared anchored L-grams with probability 1-(1-1/d)^(r-L+1): the same
    * deterministic-but-guarantee-free trade CDC chunking makes, at 1/d the
    * index size of the exact method. Per doc: distinct anchored grams, how
    * many are shared with ANY other document, and the duplicated fraction
    * — the "how much of this document is copied text" curation signal.
    *
    * Scale shape: one text pass (per-row anchor kernel + md5 grams), a
    * gram-keyed map-side-combined frequency aggregate, one join back, one
    * per-doc aggregate. Nothing quadratic; hot boilerplate grams cost
    * postings, not pairs (no pair enumeration anywhere).
    */
  def substringAnchorCensus(docs: DataFrame, L: Int = 48, d: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = docs
      .withColumn("g", explode(expr(
        s"array_distinct(transform(graft_anchors(text, $L, $d), " +
          s"i -> md5(substring(text, i - ${L - 1}, $L))))")))
      .select(col("doc_id"), col("g"))
    val freq = grams.groupBy(col("g")).agg(count(lit(1)).as("n_docs"))
    grams.join(freq, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("n_docs") > 1, 1)).as("n_shared"))
      .withColumn("dup_fraction",
        col("n_shared").cast("double") / col("n_grams"))
  }

  /** [[substringAnchorCensus]] with winnowing's DETECTION GUARANTEE
    * (Schleimer et al. 2003, the MOSS scheme): instead of mod-divisibility
    * anchors (deterministic but guarantee-free — a run's window hashes can
    * all be non-divisible), select the argmin position of EVERY window of
    * `W` consecutive window-hashes. By construction every W-window
    * contains a selected position, and a window fully inside a shared run
    * sees only run content — so ANY shared substring of length ≥ L+W-1 is
    * guaranteed to produce a shared anchored gram in both documents.
    * Density is the same ~2/(W+1) expected anchors per position family.
    *
    * The selection runs inside `graft_winnow_positions` — the hash pass
    * fused with a monotonic-deque argmin, O(len) per row with first-
    * occurrence tie-break parity to the array-lambda form it replaced
    * (see [[graft.functions.WinnowPositions]]). Docs shorter than L+W-1
    * code points have no full window and drop out (empty position array →
    * explode emits nothing). Census columns match
    * [[substringAnchorCensus]].
    */
  def winnowedAnchorCensus(docs: DataFrame, L: Int = 48, W: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = docs
      .withColumn("g", explode(expr(
        s"""array_distinct(transform(graft_winnow_positions(text, $L, $W),
           |  p -> md5(substring(text, p, $L))))""".stripMargin)))
      .select(col("doc_id"), col("g"))
    val freq = grams.groupBy(col("g")).agg(count(lit(1)).as("n_docs"))
    grams.join(freq, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("n_docs") > 1, 1)).as("n_shared"))
      .withColumn("dup_fraction",
        col("n_shared").cast("double") / col("n_grams"))
  }

  /** Span-level exact-substring CUT — the deliverable the anchored/
    * winnowed censuses exist to feed (Lee et al. 2022: after the census
    * says 20% of bytes are copies, emit the CLEANED corpus). For every
    * winnow-selected gram shared by ≥ 2 DISTINCT documents (cross-doc
    * sharing, matching [[winnowedAnchorCensus]]'s signal; intra-doc
    * repeats are not cut), the witnessed span [p, p+L-1] is removed from
    * EVERY document containing it (cut-all semantics — the guarantee
    * below needs no canonical survivor) — or, with `keepOne`, from every
    * holder EXCEPT the gram's minimum-doc-id canonical, retaining exactly
    * one copy of each duplicate (the curation default; the no-surviving-
    * run guarantee then applies to non-canonical pairs). Overlapping/
    * adjacent witnessed spans are merged first, and the surviving
    * segments re-join in original order.
    *
    * Guarantee (inherited from winnowing's detection property): any run
    * of length ≥ L+W-1 shared between two docs contains a full W-window
    * of identical gram hashes in both, whose leftmost-argmin selection is
    * content-determined — so the run witnesses a shared cut span in BOTH
    * docs, and inductively every surviving fragment of a shared run is
    * shorter than L+W-1 (SubstringCutSpec proves it pairwise brute-force).
    *
    * Scale shape: one O(len) winnow pass + frequency aggregate (the
    * census plan), then spans only — (doc_id, pos) rows for SHARED
    * anchors, a doc-partitioned lag/island window and a per-doc bounded
    * span-list aggregate — joined back to the corpus for one final O(len)
    * segment-fold per row. Corpus text crosses exactly one shuffle (the
    * doc_id join); the window machinery sees positions, never text.
    *
    * Output: doc_id, n_spans, chars_cut, clean_len, clean_md5 — the
    * cleaned text is pinned by md5+length rather than dumped (the
    * [[paragraphDedup]] convention).
    */
  def substringSpanCut(docs: DataFrame, L: Int = 48, W: Int = 8,
      keepOne: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = docs
      .withColumn("p", explode(expr(s"graft_winnow_positions(text, $L, $W)")))
      .select(col("doc_id"), col("p"),
        expr(s"md5(substring(text, p, $L))").as("g"))
    val freq = grams.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_doc"))
    // keepOne = the Lee-et-al curation default: the gram's CANONICAL
    // holder (minimum doc id) keeps its span, every other holder cuts —
    // the corpus retains exactly one copy of each witnessed duplicate
    // instead of none (cut-all, the guarantee-bearing mode)
    val shared = grams.join(freq.filter(col("n_docs") > 1), Seq("g"))
      .filter(if (keepOne) col("doc_id") =!= col("min_doc") else lit(true))
      .select(col("doc_id"), col("p"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val spans = shared
      .withColumn("prev_p", lag(col("p"), 1).over(wOrd))
      // a new island starts when this anchor's span [p, p+L-1] neither
      // overlaps nor touches the previous one ([prev, prev+L-1])
      .withColumn("flag",
        when(col("prev_p").isNull || col("p") <= col("prev_p") + L, 0)
          .otherwise(1))
      .withColumn("island",
        sum(col("flag")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("s"), (max(col("p")) + lit(L - 1)).as("e"))
    val spanList = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("chars_cut"),
        array_sort(collect_list(struct(col("s"), col("e")))).as("spans"))
    docs.join(spanList, Seq("doc_id"), "left")
      .withColumn("clean_text",
        when(col("spans").isNull, col("text")).otherwise(expr(
          """aggregate(spans,
            |  struct(CAST(1 AS INT) AS cur, CAST('' AS STRING) AS acc),
            |  (st, sp) -> struct(CAST(sp.e + 1 AS INT) AS cur,
            |    concat(st.acc, substring(text, st.cur, sp.s - st.cur)) AS acc),
            |  st -> concat(st.acc, substring(text, st.cur)))""".stripMargin)))
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("chars_cut"), lit(0L)).as("chars_cut"),
        length(col("clean_text")).as("clean_len"),
        md5(col("clean_text")).as("clean_md5"))
  }

  /** [[substringSpanCut]] returning the cleaned TEXT itself instead of its
    * fingerprint — the form downstream curation stages chain on
    * ([[Curate.releaseCorpus]]). Same spans, same reassembly; the
    * fingerprint query stays the oracle-checked witness of this pipeline.
    */
  def substringSpanCutText(docs: DataFrame, L: Int = 48, W: Int = 8,
      keepOne: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = docs
      .withColumn("p", explode(expr(s"graft_winnow_positions(text, $L, $W)")))
      .select(col("doc_id"), col("p"),
        expr(s"md5(substring(text, p, $L))").as("g"))
    val freq = grams.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_doc"))
    val shared = grams.join(freq.filter(col("n_docs") > 1), Seq("g"))
      .filter(if (keepOne) col("doc_id") =!= col("min_doc") else lit(true))
      .select(col("doc_id"), col("p"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val spans = shared
      .withColumn("prev_p", lag(col("p"), 1).over(wOrd))
      .withColumn("flag",
        when(col("prev_p").isNull || col("p") <= col("prev_p") + L, 0)
          .otherwise(1))
      .withColumn("island",
        sum(col("flag")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("s"), (max(col("p")) + lit(L - 1)).as("e"))
    val spanList = spans.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("s"), col("e")))).as("spans"))
    docs.join(spanList, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("spans").isNull, col("text")).otherwise(expr(
          """aggregate(spans,
            |  struct(CAST(1 AS INT) AS cur, CAST('' AS STRING) AS acc),
            |  (st, sp) -> struct(CAST(sp.e + 1 AS INT) AS cur,
            |    concat(st.acc, substring(text, st.cur, sp.s - st.cur)) AS acc),
            |  st -> concat(st.acc, substring(text, st.cur)))""".stripMargin))
          .as("clean_text"))
  }

  /** 60-bit SimHash over hashed shingles: bit j is set when at least half
    * the shingles have bit j set. Pure column math, no shuffle.
    */
  def withSimhash(docs: DataFrame, n: Int = defaultShingle): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // bit j of the result = majority vote over shingle-hash bits (see
    // functions.SimHash60 — fused native loop, same arithmetic as the
    // aggregate/filter HOF formulation mirrored in the DuckDB oracle)
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= n)
      .withColumn("h60", expr(s"graft_shingle_hashes(toks, $n, false)"))
      .withColumn("simhash", expr("graft_simhash60(h60)"))
  }

  /** SimHash near-dup pairs: 4×15-bit band join, then Hamming ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val sh = withSimhash(docs).select(col("doc_id"), col("simhash"))
    val chunks = sh.select(col("doc_id"), col("simhash"),
        explode(expr("sequence(0, 3)")).as("c"))
      .withColumn("chunk", expr("shiftright(simhash, c * 15) & 32767"))
    val cand = chunks.as("a")
      .join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.simhash").as("sim_a"),
        col("b.doc_id").as("doc_b"), col("b.simhash").as("sim_b"))
      .distinct()
    cand
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Near-duplicate pairs by content-defined chunk overlap: two documents
    * sharing >= `minShared` distinct CDC chunk fingerprints
    * ([[TextAnalysis.cdcChunks]]). Because chunk boundaries re-synchronize
    * after local edits, shared-chunk count survives insertions/deletions
    * that would defeat whole-document hashing — this is the chunk-level
    * dedup a training-data pipeline runs after exact dedup.
    *
    * Scale shape is the band-join pattern: the self-join shuffles
    * (doc, chunk_hash) pairs, joining only within a chunk-hash bucket —
    * O(docs×chunks/doc), never all-pairs. Ubiquitous boilerplate chunks
    * would create hot buckets, so hashes appearing in more than `maxDf`
    * documents are dropped first (they carry no dedup signal anyway) —
    * the same hot-key cap the MinHash band join relies on.
    */
  def cdcOverlapPairs(docs: DataFrame, minShared: Int, maxDf: Int = 100,
                      w: Int = 16, divisor: Int = 64): DataFrame = {
    val chunks = TextAnalysis.cdcChunks(docs, w, divisor)
      .select(col("doc_id"), col("chunk_hash")).distinct()
    // document frequency as a window count: one exchange on chunk_hash,
    // which the band self-join below then reuses (vs. a groupBy + re-join,
    // which pays the same exchange twice more)
    val kept = chunks
      .withColumn("df", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("chunk_hash"))))
      .filter(col("df") <= maxDf)
      .drop("df")
    kept.as("a").join(kept.as("b"),
        col("a.chunk_hash") === col("b.chunk_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_chunks"))
      .filter(col("shared_chunks") >= minShared)
  }

  /** Exact duplicate groups on raw text. */
  def exactDuplicateGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("canonical_doc"), count(lit(1)).as("n_docs"))

  /** Segment each document into non-overlapping `k`-token windows — the
    * corpus-agnostic stand-in for paragraph boundaries (the testdata has
    * no newlines; on real data the splitter would be `split(text, '\n\n')`
    * with the rest of the pipeline unchanged).
    * One narrow projection, no shuffle: (doc_id, seg_no, seg).
    */
  def withSegments(docs: DataFrame, k: Int): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("seg_no",
        explode(sequence(lit(0),
          (ceil(size(col("toks")) / lit(k.toDouble)) - 1).cast("int"))))
      .select(col("doc_id"), col("seg_no"),
        array_join(slice(col("toks"), col("seg_no") * k + 1, lit(k)), " ").as("seg"))

  /** C4/CCNet-style paragraph-level exact dedup: a segment whose identical
    * text appears in `maxDf`-or-more DISTINCT documents is boilerplate
    * (headers, footers, license blocks, navigation chrome) and is removed
    * from EVERY document; the survivors are re-joined in order into the
    * cleaned text. This is the line/paragraph-granular complement to the
    * whole-document dedup family above — near-dup pairing keeps one copy
    * of a shared document, this strips the shared FRAGMENTS out of
    * otherwise-distinct documents.
    *
    * Scale shape (100 TB): segments flow as (md5, doc_id, seg_no) — one
    * shuffle to count per-hash distinct-document frequency (partial
    * aggregation applies), one hash-keyed anti-join against the
    * boilerplate set (df ≥ maxDf — a tiny, skew-free relation that AQE
    * broadcasts), one doc_id shuffle to reassemble. No all-pairs step
    * anywhere; cost is linear in corpus tokens.
    *
    * @return one row per document: (doc_id, n_segs, n_kept, clean_md5) —
    *         a fully-boilerplate document survives with n_kept = 0 and
    *         the md5 of the empty string
    */
  def paragraphDedup(docs: DataFrame, k: Int = 4, maxDf: Int = 2): DataFrame = {
    val segs = withSegments(docs, k).withColumn("h", md5(col("seg")))
    val boilerplate = segs.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= maxDf)
    val kept = segs.join(boilerplate, Seq("h"), "left_anti")
    val reassembled = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("seg_no"), col("seg")))),
            s => s.getField("seg")), " ").as("clean"))
    docs.select(col("doc_id"),
        ceil(size(split(col("text"), " ")) / lit(k.toDouble)).cast("long").as("n_segs"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("clean"), lit(""))).as("clean_md5"))
  }

  /** [[paragraphDedup]] returning the reassembled TEXT (boilerplate
    * segments removed, '' when nothing survives) — the chaining form for
    * [[Curate.releaseCorpus]]; the fingerprint query stays the oracle.
    */
  def paragraphDedupText(docs: DataFrame, k: Int = 4, maxDf: Int = 2): DataFrame = {
    val segs = withSegments(docs, k).withColumn("h", md5(col("seg")))
    val boilerplate = segs.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= maxDf)
    val kept = segs.join(boilerplate, Seq("h"), "left_anti")
    val reassembled = kept.groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("seg_no"), col("seg")))),
          s => s.getField("seg")), " ").as("clean"))
    docs.select(col("doc_id"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("clean"), lit("")).as("clean_text"))
  }

  /** Connected components over near-dup PAIRS — the cluster-resolution
    * step a real dedup pipeline runs after pairwise detection: similarity
    * is not transitive, but the KEEP/DROP decision must be (if a~b and
    * b~c, keeping both a and c double-counts the shared content), so
    * documents are grouped into transitive clusters and one canonical
    * (minimum id) survives per cluster.
    *
    * Algorithm: iterated min-label propagation to FIXPOINT — each round,
    * every node takes the min of its own label and its neighbors' labels;
    * convergence is decided by the monotone label-sum invariant (labels
    * only ever decrease, so the exact decimal sum of all labels strictly
    * drops iff any label changed — one aggregate per round), so the
    * iteration count is the true cluster diameter, never a guessed
    * constant. Deterministic (min is order-independent). Each round is
    * one join + one partial-aggregated groupBy; near-dup clusters are
    * shallow (dozens of docs, diameter ≲ 5), so rounds stay single-digit
    * even at corpus scale; every round local-checkpoints its label table
    * so plan size stays O(1) in the round count. For adversarially long
    * chains [[connectedComponentsStar]] (same contract, O(log n) rounds)
    * is the insurance path.
    *
    * @param pairs (doc_a, doc_b) undirected near-dup edges
    * @return (node, comp): every document appearing in a pair, labeled
    *         with its cluster's minimum doc id
    */
  def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponentsCounted(pairs)._1

  private[graft] def connectedComponentsCounted(pairs: DataFrame): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    // STORAGE-BOUNDARY the edges before iterating, at the session's full
    // shuffle width (the override below must scope the tiny label
    // iteration only, never the upstream dedup joins producing the
    // pairs). A cache() would materialize the same rows but keep the
    // corpus-scale pair-generation lineage attached to every round's
    // logical plan — each round then re-optimizes and re-codegens the
    // whole LSH pipeline, which measured as a cold first run an order of
    // magnitude over the steady state. The scratch write makes every
    // round's plan a leaf scan + join + agg; the edge set itself is tiny
    // relative to the corpus (near-dup pairs), so the write is noise.
    val edgesDir = graft.stages.TempDirs.scratch("graft_cc_edges_")
    pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .unionByName(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .write.mode("overwrite").parquet(edgesDir)
    val edges = spark.read.parquet(edgesDir).cache()
    // the label table is |docs in pairs| rows — corpus-scale shuffle width
    // for it is pure task overhead in the iteration; scope it down the way
    // the streaming drains do (on a cluster, size to the pair count)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      // every round LOCAL-CHECKPOINTS its label table: the round plan
      // references `labels` twice, so a cache alone (which keeps the full
      // logical lineage attached) grows the plan 2^rounds — at the ~40
      // rounds a chain-shaped cluster forces, Catalyst re-analysis and
      // AQE's eager plan-string rendering OOM'd the driver before any
      // executor work. The checkpoint truncates each round to a leaf:
      // O(1) plan size forever, at the price of edge-set-sized blocks the
      // ContextCleaner frees as superseded rounds are collected.
      var labels: DataFrame = edges.select(col("a").as("node")).distinct()
        .withColumn("comp", col("node")).localCheckpoint()
      // convergence via the label-sum invariant: comps only ever DECREASE,
      // so the exact decimal sum strictly drops iff any label changed —
      // one aggregate per round instead of a join + count. Null sum ==
      // empty label table == no pairs at all: already converged.
      def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
        Option(df.agg(sum(col("comp").cast("decimal(38,0)"))).collect().head.getDecimal(0))
      var prevSum = labelSum(labels)
      var converged = prevSum.isEmpty
      var rounds = 0
      while (!converged) {
        rounds += 1
        val next = edges
          .join(labels.select(col("node").as("b"), col("comp").as("n_comp")), Seq("b"))
          .select(col("a").as("node"), col("n_comp").as("comp"))
          .unionByName(labels)
          .groupBy(col("node")).agg(min(col("comp")).as("comp"))
          .localCheckpoint()
        labels = next
        val nextSum = labelSum(next)
        converged = nextSum == prevSum
        prevSum = nextSum
      }
      // hand back a storage-boundary copy: scratch parquet is removed at
      // JVM exit, and the caller holds no reference into the iteration's
      // checkpoint blocks (freed by the cleaner once unreachable)
      val out = graft.stages.TempDirs.scratch("graft_cc_")
      labels.write.mode("overwrite").parquet(out)
      (spark.read.parquet(out), rounds)
    } finally {
      // release the corpus-scale edge cache on EVERY exit path — a thrown
      // round must not leave it pinned in executor storage for the rest
      // of the session (driver ADVICE.md finding)
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      edges.unpersist()
    }
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR edge
    * rewriting (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the adversarial-shape insurance for 100 TB
    * dedup: convergence is O(log n) ROUNDS INDEPENDENT OF CLUSTER
    * DIAMETER, where [[connectedComponents]]' label propagation pays one
    * round per hop and a pathological chain (a boilerplate document
    * mutating gradually across a crawl) makes the diameter — and the
    * round count — unbounded.
    *
    * Per round, two edge rewrites, each one aggregate + one join over
    * the current edge set:
    *   - large-star: every node u links its LARGER neighbors (v > u) to
    *     m(u) = min(Γ(u) ∪ u) — long chains fold toward local minima
    *     from every node at once;
    *   - small-star: every edge oriented (hi, lo); hi links its smaller
    *     neighbors and itself to their minimum — stars flatten so the
    *     next large-star sees them as one hop.
    * Both rewrites preserve connectivity exactly (every replaced edge is
    * re-expressed through the shared minimum), never introduce new
    * components, and the fixpoint is a forest of stars centered at each
    * component's minimum id — so the final labels read directly off the
    * edges: comp(v) = least(v, min neighbor). Convergence is decided by
    * an order-insensitive edge-set checksum (count + sum of per-edge
    * xxhash64): the rewrite is deterministic, so an unchanged set is
    * exactly the fixpoint.
    *
    * Output contract is identical to [[connectedComponents]] (same
    * oracle, `dedup_components`): (node, comp) for every document
    * appearing in a pair, comp = the cluster's minimum doc id. The same
    * storage-boundary + scoped-shuffle-width discipline applies: edges
    * iterate from a scratch-parquet leaf (round plans never re-derive
    * the corpus-scale pair generation) at iteration-sized parallelism.
    */
  def connectedComponentsStar(pairs: DataFrame): DataFrame =
    connectedComponentsStarCounted(pairs)._1

  /** Edge-count bound under which star CC solves on the DRIVER with a
    * union-find instead of iterating distributed rounds. The verified
    * pair set of a mostly-clean corpus is tiny (entity resolution at
    * sf0.1: a handful of typo pairs), and each star round pays several
    * fixed shuffle jobs regardless of size — a bounded collect (≤ ~1.6 MB
    * of long pairs at this bound) plus O(E·α) union-find replaces all of
    * them. Above the bound (real near-dup corpora) the O(log n)-round
    * distributed alternation runs unchanged; the count is free — it is
    * the round-0 convergence checksum over the already-materialized
    * edge parquet.
    */
  private[graft] val ccDriverEdgeThreshold = 100000L

  private[graft] def connectedComponentsStarCounted(
      pairs: DataFrame,
      driverThreshold: Long = ccDriverEdgeThreshold): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val edgesDir = graft.stages.TempDirs.scratch("graft_ccs_edges_")
    pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .filter(col("a") =!= col("b"))
      .write.mode("overwrite").parquet(edgesDir)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    // each round rewrites the whole edge set through ~4 references to the
    // previous round's frame, so (exactly as in [[connectedComponents]])
    // only a LOCAL CHECKPOINT per round keeps the plan O(1); a cache alone
    // would grow it ~4^rounds and OOM the driver in plan rendering
    var edges: DataFrame = spark.read.parquet(edgesDir).localCheckpoint()
    try {
      // one aggregate decides convergence: edge COUNT plus an
      // order-insensitive content checksum over canonicalized edges
      def checksum(df: DataFrame): (Long, Option[java.math.BigDecimal]) = {
        val r = df.agg(
          count(lit(1)),
          sum(xxhash64(least(col("a"), col("b")), greatest(col("a"), col("b")))
            .cast("decimal(38,0)"))).collect().head
        (r.getLong(0), Option(r.getDecimal(1)))
      }

      // large-star over the SYMMETRIC view; small-star over the (hi, lo)
      // orientation. Each returns a distinct canonical edge set.
      def largeStar(e: DataFrame): DataFrame = {
        val sym = e.select(col("a"), col("b"))
          .unionByName(e.select(col("b").as("a"), col("a").as("b")))
        val mins = sym.groupBy(col("a").as("u"))
          .agg(min(col("b")).as("mn"))
          .select(col("u"), least(col("u"), col("mn")).as("m"))
        sym.filter(col("b") > col("a"))
          .join(mins, col("a") === col("u"))
          .select(col("b").as("a"), col("m").as("b"))
          .filter(col("a") =!= col("b"))
          .distinct()
      }
      def smallStar(e: DataFrame): DataFrame = {
        val ori = e.select(greatest(col("a"), col("b")).as("hi"),
            least(col("a"), col("b")).as("lo")).distinct()
        val mins = ori.groupBy(col("hi")).agg(min(col("lo")).as("m"))
        ori.join(mins, Seq("hi"))
          .select(col("lo").as("a"), col("m").as("b"))
          .unionByName(mins.select(col("hi").as("a"), col("m").as("b")))
          .filter(col("a") =!= col("b"))
          .distinct()
      }

      var prev = checksum(edges)
      // driver fast path: bounded verified pair set + long node ids →
      // union-find with union-by-min-root (roots only ever decrease, and
      // every node starts as its own root, so the fixpoint root IS the
      // component minimum — the exact distributed contract)
      if (prev._1 > 0L && prev._1 <= driverThreshold &&
          edges.schema.fields.forall(_.dataType ==
            org.apache.spark.sql.types.LongType)) {
        import spark.implicits._
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x
          while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        edges.collect().foreach { row =>
          val a = row.getLong(0); val b = row.getLong(1)
          parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
          }
        }
        val labelRows = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size())
        parent.keySet().forEach(n => labelRows += ((n, find(n))))
        val out = graft.stages.TempDirs.scratch("graft_ccs_")
        labelRows.toSeq.toDF("node", "comp").write.mode("overwrite").parquet(out)
        return (spark.read.parquet(out), 0)
      }
      var rounds = 0
      var converged = prev._1 == 0L
      while (!converged) {
        rounds += 1
        edges = smallStar(largeStar(edges)).localCheckpoint()
        val sum = checksum(edges)
        converged = sum == prev
        prev = sum
      }
      // fixpoint edges are stars on the component minimum: labels read
      // directly off them (center = least of itself and its neighbors)
      val labels = edges.select(col("a"), col("b"))
        .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
        .groupBy(col("a").as("node"))
        .agg(min(col("b")).as("mn"))
        .select(col("node"), least(col("node"), col("mn")).as("comp"))
      val out = graft.stages.TempDirs.scratch("graft_ccs_")
      labels.write.mode("overwrite").parquet(out)
      (spark.read.parquet(out), rounds)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }

  /** (doc_id, band, band_key) rows of a MinHash signature frame — THE
    * banding used by [[minhashLshPairs]] and the incremental curation
    * index ([[Curate.curateCorpusIncremental]]), shared so a persisted
    * index can never band differently from the live LSH join.
    */
  private[ops] def bandRowsOf(sigs: DataFrame): DataFrame =
    sigs.select(
        col("doc_id"),
        explode(expr(s"sequence(0, ${bands - 1})")).as("band"),
        col("sig"))
      .select(col("doc_id"), col("band"), expr(
        s"""concat_ws(',', transform(slice(sig, band * $rowsPerBand + 1, $rowsPerBand),
           |  x -> CAST(x AS STRING)))""".stripMargin).as("band_key"))

  private[ops] def verifyJaccard(pairs: DataFrame, shingleSets: DataFrame,
                                 tau: Double): DataFrame =
    pairs
      .join(shingleSets.select(col("doc_id").as("doc_a"), col("hbase").as("h_a")), Seq("doc_a"))
      .join(shingleSets.select(col("doc_id").as("doc_b"), col("hbase").as("h_b")), Seq("doc_b"))
      .withColumn("n_inter", size(array_intersect(col("h_a"), col("h_b"))))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (size(col("h_a")) + size(col("h_b")) - col("n_inter")))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** Edit-distance-1 neighbor census via DELETION-NEIGHBORHOOD blocking
    * (FastSS): each string's candidate block key set is itself plus every
    * single-character deletion, and two strings within Levenshtein
    * distance 1 ALWAYS share a key (equal → the string itself;
    * substitution at i → both drop position i; insert/delete → the
    * shorter string IS a deletion variant of the longer). Sharing a key
    * does not imply distance ≤ 1 (two different substitutions at the same
    * position also collide), so candidates are verified with the exact
    * `levenshtein` — the blocking is complete, the verify makes it sound,
    * and the quadratic oracle proves both.
    *
    * Scale shape: the explode is O(n·len) rows, the candidate join is a
    * hash join on the variant key with naturally bounded buckets (a block
    * only holds strings one edit from a shared deletion), and the exact
    * distance runs per CANDIDATE, never per pair of the corpus — the
    * difference between n·len and n² at 100 TB.
    */
  def editDistance1Neighbors(df: DataFrame, keyCol: String, strCol: String): DataFrame = {
    val base = df.select(col(keyCol).cast("long").as("k"), col(strCol).as("s"))
    val candidates = editDistance1Pairs(df, keyCol, strCol)
    val symmetric = candidates.select(col("ka").as("k"), col("kb").as("n"))
      .unionByName(candidates.select(col("kb").as("k"), col("ka").as("n")))
    base.join(symmetric, Seq("k"), "left")
      .groupBy(col("k").as(keyCol))
      .agg(count(col("n")).as("n_near"), min(col("n")).as("nearest_key"))
  }

  /** The verified edit-distance-1 pair list behind
    * [[editDistance1Neighbors]] — FastSS deletion-neighborhood blocking +
    * exact levenshtein verify, `ka < kb` canonical. Exposed separately so
    * entity resolution can feed the pairs into connected components.
    */
  def editDistance1Pairs(df: DataFrame, keyCol: String, strCol: String): DataFrame = {
    val base = df.select(col(keyCol).cast("long").as("k"), col(strCol).as("s"))
    // array_union also dedups repeated variants of strings with runs of
    // the same character, keeping the explode minimal. The exploded frame
    // feeds BOTH sides of the self-join, but needs no explicit
    // materialization: the two sides canonicalize to the same subplan, so
    // the shuffle-join exchange is computed once and REUSED
    // (ReusedExchange in the plan); the operator stays a lazy,
    // side-effect-free plan like every other GQuery input. (A broadcast
    // of one side at small scale recomputes the explode once — exactly
    // the scale at which that is free.)
    val variants = base.withColumn("variant", explode(expr(
      """array_union(array(s),
           transform(sequence(1, length(s)),
             i -> concat(substring(s, 1, i - 1), substring(s, i + 1, length(s)))))""")))
    variants.as("a")
      .join(variants.as("b"),
        col("a.variant") === col("b.variant") && col("a.k") < col("b.k"))
      .select(col("a.k").as("ka"), col("b.k").as("kb"),
        col("a.s").as("sa"), col("b.s").as("sb"))
      .distinct()
      .filter(expr("levenshtein(sa, sb) <= 1"))
      .select(col("ka"), col("kb"))
  }
}
