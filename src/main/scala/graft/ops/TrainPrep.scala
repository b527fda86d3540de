package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-set preparation operators — the steps between a curated corpus
  * ([[Curate]]) and a training run, each deterministic and oracle-checkable:
  *
  *   - **stratified sampling**: per-language hash-bucket rates, the
  *     training-mix knob (`sample()`-style RNG cannot give stable mixes);
  *   - **sequence packing**: fixed-length token windows per document, the
  *     unit a trainer consumes, content-addressed by hash;
  *   - **benchmark decontamination**: n-gram overlap of training documents
  *     against the held-out split — the standard eval-contamination check
  *     run before any benchmark number is trusted.
  *
  * Everything is integer counts / md5-derived buckets plus at most one
  * final double division, so results are independent of partitioning and
  * match the DuckDB mirror bit-for-bit (the engine's cross-engine numeric
  * contract, see Ledger.scala).
  */
object TrainPrep {

  /** Deterministic md5 bucket in [0, 100) with a salt that decorrelates
    * different sampling decisions on the same corpus (sampling must not
    * reuse the train/val/test buckets of [[TextAnalysis.withSplit]], or
    * "sample 10%" would always pick the val+test documents).
    */
  private def pctBucket(salt: String): Column =
    expr(s"CAST(conv(substring(md5(concat('$salt', CAST(doc_id AS STRING))), 1, 4), 16, 10) AS INT) % 100")

  /** Stratified sample: keep each document iff its salted hash bucket falls
    * under its language's percentage rate. Hash-based membership is stable
    * under reruns, partitioning, and corpus growth, and the per-stratum
    * rate is the training-mix lever (e.g. upsample low-resource languages).
    * One narrow filter — no shuffle, no RNG.
    */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int],
                       defaultRate: Int = 10, salt: String = "sample:"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (lang, r)) =>
      when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    docs.filter(pctBucket(salt) < rate)
  }

  /** Per-language census of a stratified sample: total vs sampled counts
    * and the achieved rate — what a mix planner checks against its targets.
    */
  def sampleCensus(docs: DataFrame, rates: Map[String, Int],
                   defaultRate: Int = 10): DataFrame = {
    val totals = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val sampled = stratifiedSample(docs, rates, defaultRate)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
    totals.join(sampled, Seq("lang"), "left")
      .withColumn("n_sampled", coalesce(col("n_sampled"), lit(0L)))
      .withColumn("achieved_rate",
        col("n_sampled").cast("double") / col("n_total"))
  }

  /** Sequence packing: split every document's token stream into fixed
    * `seqLen`-token windows — (doc_id, seq_no, n_toks, seq_hash), the unit
    * a trainer consumes. The final window carries the remainder
    * (un-padded; padding is a trainer concern). `seq_hash` is the md5 of
    * the window's tokens, making every sequence content-addressable (shard
    * dedup, resumable sharding). Pure per-row array algebra — zero
    * shuffles; a downstream repartition(seq_hash) is the one exchange
    * sharding needs.
    */
  def packSequences(docs: DataFrame, seqLen: Int): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("toks"),
        posexplode(expr(s"sequence(0, CAST(ceil(size(toks) / CAST($seqLen AS DOUBLE)) AS INT) - 1)"))
          .as(Seq("idx", "seq_no")))
      .withColumn("seq_toks", expr(s"slice(toks, seq_no * $seqLen + 1, $seqLen)"))
      .select(col("doc_id"),
        col("seq_no").cast("int").as("seq_no"),
        size(col("seq_toks")).as("n_toks"),
        md5(concat_ws(" ", col("seq_toks"))).as("seq_hash"))

  /** First-fit-decreasing bin-packing census — the measured packing
    * number a pretraining loader wants next to [[packSequences]]'s fixed
    * windows: how many `capacity`-token bins FFD needs per shard, the
    * padding waste per bin, and the one-sequence-per-document baseline
    * waste it beats. FFD is inherently sequential, so the distributed
    * form is PER SHARD (`doc_id % nShards` — exactly how a loader shards
    * its input): each shard's pack is one fold over its
    * (length desc, doc_id)-sorted doc list, an O(docs·bins) aggregate
    * expression evaluated post-shuffle — no driver loop, ONE groupBy
    * exchange, shard count the parallelism knob. Deterministic: FFD
    * order is pinned (length desc, id asc), first-fit picks the lowest
    * bin index. Docs over capacity are censused separately (they go to
    * the splitter, not the packer). Integer-only output — hash-exact.
    */
  def ffdPackCensus(docs: DataFrame, capacity: Int, nShards: Int = 8): DataFrame = {
    val cap = s"CAST($capacity AS BIGINT)"
    val lens = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("len"))
      .withColumn("shard", (col("doc_id") % nShards).cast("int"))
    val over = lens.filter(col("len") > capacity)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_oversize"), sum(col("len")).as("oversize_tokens"))
    val packed = lens.filter(col("len") <= capacity)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("len")).as("total_tokens"),
        expr("sort_array(collect_list(struct(-len AS nl, doc_id AS d, len AS l)))")
          .as("q"))
      // the FFD fold: acc = bin loads; place each length into the FIRST
      // bin it fits (array_position over the fits mask — 0 = none, open a
      // new bin; Spark transform indexes are 0-based, hence pos - 1)
      .withColumn("bins", expr(
        s"""aggregate(transform(q, s -> s.l), CAST(array() AS ARRAY<BIGINT>),
           |  (acc, L) -> CASE
           |    WHEN array_position(transform(acc, b -> b + L <= $cap), true) = 0
           |      THEN concat(acc, array(L))
           |    ELSE transform(acc, (b, i) ->
           |      CASE WHEN i = array_position(transform(acc, b2 -> b2 + L <= $cap), true) - 1
           |           THEN b + L ELSE b END)
           |  END)""".stripMargin))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        size(col("bins")).cast("long").as("n_bins_ffd"),
        (size(col("bins")).cast("long") * capacity - col("total_tokens"))
          .as("ffd_waste"),
        expr(s"total_tokens * 10000 div (size(bins) * $cap)").as("fill_e4"),
        (col("n_docs") * capacity - col("total_tokens")).as("baseline_waste"))
    // FULL OUTER: a shard whose docs are ALL oversize has no packing row,
    // but its oversize census must still surface (a left join keyed on
    // the packing side silently dropped such shards); packing columns
    // coalesce to 0 — except fill_e4, which is genuinely undefined over
    // zero bins and stays NULL
    packed.join(over, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("total_tokens"), lit(0L)).as("total_tokens"),
        coalesce(col("n_bins_ffd"), lit(0L)).as("n_bins_ffd"),
        coalesce(col("ffd_waste"), lit(0L)).as("ffd_waste"),
        col("fill_e4"),
        coalesce(col("baseline_waste"), lit(0L)).as("baseline_waste"),
        coalesce(col("n_oversize"), lit(0L)).as("n_oversize"),
        coalesce(col("oversize_tokens"), lit(0L)).as("oversize_tokens"))
  }

  /** Split-then-pack census — [[ffdPackCensus]]'s missing half: that
    * census sends oversize docs "to the splitter", and this IS the
    * splitter. Every oversize doc is cut into ⌈len/capacity⌉ pieces
    * (full-capacity windows + the remainder — [[packSequences]]'s window
    * rule), the pieces rejoin the in-capacity docs, and the whole shard
    * FFD-packs: nothing is censused out, every token lands in a bin.
    * FFD order is pinned (piece length desc, doc_id, piece_no); the fold
    * and its scale shape are [[ffdPackCensus]]'s (one groupBy exchange,
    * per-shard sequential fold as an aggregate expression, shard count =
    * parallelism knob). Integer-only output — hash-exact. Full-capacity
    * pieces fill bins exactly, so `ffd_waste` here is the TRUE padding
    * floor of the corpus at this capacity — the number the loader's
    * throughput model wants.
    */
  def splitPackCensus(docs: DataFrame, capacity: Int, nShards: Int = 8): DataFrame = {
    val cap = s"CAST($capacity AS BIGINT)"
    val lens = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("len"))
      .withColumn("shard", (col("doc_id") % nShards).cast("int"))
    val pieces = lens
      .select(col("shard"), col("doc_id"), col("len"),
        posexplode(expr(
          s"transform(sequence(0, CAST(ceil(len / CAST($capacity AS DOUBLE)) AS INT) - 1), " +
          s"p -> least($cap, len - p * $cap))")).as(Seq("piece_no", "plen")))
    pieces
      .groupBy(col("shard"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(when(col("piece_no") > 0, lit(1))).as("n_overflow_pieces"),
        count(lit(1)).as("n_pieces"),
        sum(col("plen")).as("total_tokens"),
        expr("sort_array(collect_list(struct(-plen AS nl, doc_id AS d, piece_no AS p, plen AS l)))")
          .as("q"))
      .withColumn("bins", expr(
        s"""aggregate(transform(q, s -> s.l), CAST(array() AS ARRAY<BIGINT>),
           |  (acc, L) -> CASE
           |    WHEN array_position(transform(acc, b -> b + L <= $cap), true) = 0
           |      THEN concat(acc, array(L))
           |    ELSE transform(acc, (b, i) ->
           |      CASE WHEN i = array_position(transform(acc, b2 -> b2 + L <= $cap), true) - 1
           |           THEN b + L ELSE b END)
           |  END)""".stripMargin))
      .select(col("shard"), col("n_docs"), col("n_pieces"),
        col("n_overflow_pieces"), col("total_tokens"),
        size(col("bins")).cast("long").as("n_bins_ffd"),
        (size(col("bins")).cast("long") * capacity - col("total_tokens"))
          .as("ffd_waste"),
        expr(s"total_tokens * 10000 div (size(bins) * $cap)").as("fill_e4"))
  }

  /** Capacity sweep card — the "pick your sequence length" tuning knob
    * of the packing family, the sibling of the ANN serving cards: the
    * same FFD fold ([[ffdPackCensus]]) run at each candidate capacity,
    * aggregated corpus-wide, so one table prices the trade a training
    * pipeline actually tunes — shorter sequences cut attention FLOPs but
    * push docs to the splitter (n_oversize) and waste pad tokens
    * (ffd_waste / fill_e4). Lengths are tokenized ONCE (checkpointed —
    * one corpus pass feeds every arm); each arm is a per-shard fold +
    * one |shards|-row aggregate. Integer-only output.
    */
  def packCapacityReport(docs: DataFrame,
                         capacities: Seq[Int] = Seq(32, 64, 96, 128),
                         nShards: Int = 8): DataFrame = {
    val lens = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("len"))
      .withColumn("shard", (col("doc_id") % nShards).cast("int"))
      .localCheckpoint(true)
    def arm(capacity: Int): DataFrame = {
      val cap = s"CAST($capacity AS BIGINT)"
      val packed = lens.filter(col("len") <= capacity)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("total_tokens"),
          expr("sort_array(collect_list(struct(-len AS nl, doc_id AS d, len AS l)))")
            .as("q"))
        .withColumn("bins", expr(
          s"""aggregate(transform(q, s -> s.l), CAST(array() AS ARRAY<BIGINT>),
             |  (acc, L) -> CASE
             |    WHEN array_position(transform(acc, b -> b + L <= $cap), true) = 0
             |      THEN concat(acc, array(L))
             |    ELSE transform(acc, (b, i) ->
             |      CASE WHEN i = array_position(transform(acc, b2 -> b2 + L <= $cap), true) - 1
             |           THEN b + L ELSE b END)
             |  END)""".stripMargin))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("total_tokens")).as("total_tokens"),
          sum(size(col("bins")).cast("long")).as("n_bins"))
      val over = lens.filter(col("len") > capacity)
        .agg(count(lit(1)).as("n_oversize"))
      packed.crossJoin(over)
        .select(lit(capacity.toLong).as("capacity"),
          col("n_docs"), col("n_oversize"), col("n_bins"), col("total_tokens"),
          (col("n_bins") * capacity - col("total_tokens")).as("ffd_waste"),
          expr(s"total_tokens * 10000 div (n_bins * $cap)").as("fill_e4"))
    }
    capacities.map(arm).reduce(_ unionByName _).orderBy(col("capacity"))
  }

  /** Next-fit packing census — the ONLINE discipline next to
    * [[ffdPackCensus]]'s offline FFD: a streaming loader sees docs in
    * arrival order and keeps exactly ONE open bin (close it when the next
    * doc doesn't fit), so the fold state is just (bins, open-bin load) —
    * no sorted list, no bin array. The census prices what the one-pass
    * constraint costs: NF waste vs the same shard's FFD waste, from the
    * same tokenize pass. Arrival order = doc_id (the loader's manifest
    * order); oversize docs go to the splitter as in FFD.
    */
  def nextFitPackCensus(docs: DataFrame, capacity: Int, nShards: Int = 8): DataFrame = {
    val cap = s"CAST($capacity AS BIGINT)"
    val lens = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("len"))
      .withColumn("shard", (col("doc_id") % nShards).cast("int"))
      .filter(col("len") <= capacity)
      .localCheckpoint(true) // feeds both the NF and FFD folds
    val common = lens.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("len")).as("total_tokens"),
        expr("transform(sort_array(collect_list(struct(doc_id AS d, len AS l))), s -> s.l)")
          .as("arrival"),
        expr("transform(sort_array(collect_list(struct(-len AS nl, doc_id AS d, len AS l))), s -> s.l)")
          .as("sorted"))
      // next-fit: acc = (bins, load of the single open bin)
      .withColumn("_nf", expr(
        s"""aggregate(arrival, named_struct('bins', CAST(0 AS BIGINT), 'load', $cap),
           |  (acc, L) -> CASE WHEN acc.load + L <= $cap
           |    THEN named_struct('bins', acc.bins, 'load', acc.load + L)
           |    ELSE named_struct('bins', acc.bins + CAST(1 AS BIGINT), 'load', L) END)""".stripMargin))
      // the FFD fold (ffdPackCensus's) over the same shard for the delta
      .withColumn("_ffd", expr(
        s"""aggregate(sorted, CAST(array() AS ARRAY<BIGINT>),
           |  (acc, L) -> CASE
           |    WHEN array_position(transform(acc, b -> b + L <= $cap), true) = 0
           |      THEN concat(acc, array(L))
           |    ELSE transform(acc, (b, i) ->
           |      CASE WHEN i = array_position(transform(acc, b2 -> b2 + L <= $cap), true) - 1
           |           THEN b + L ELSE b END)
           |  END)""".stripMargin))
    common.select(col("shard"), col("n_docs"), col("total_tokens"),
        col("_nf.bins").as("n_bins_nf"),
        size(col("_ffd")).cast("long").as("n_bins_ffd"))
      .withColumn("nf_waste", col("n_bins_nf") * capacity - col("total_tokens"))
      .withColumn("ffd_waste", col("n_bins_ffd") * capacity - col("total_tokens"))
      .withColumn("online_penalty_bins", col("n_bins_nf") - col("n_bins_ffd"))
  }

  /** Deterministic weighted dataset interleaving — the ORDER a training
    * dataloader actually emits when sampling from per-language streams
    * proportionally (tf.data sample_from_datasets / Pile-style mixing),
    * made exact: each doc's virtual time = rank-within-stream / weight
    * (integer 1e6 cross-multiplication, no float), the global schedule
    * sorts by it, and any prefix of the schedule is weight-proportional —
    * which is the property that makes mixing ratios hold from step one
    * instead of only in expectation. Returns the first `take` schedule
    * positions. Scale shape: per-stream ranks are windows PARTITIONED by
    * the stream key; the schedule head is TakeOrdered (no global sort);
    * only the `take`-row head crosses a single-partition window for its
    * position number.
    */
  def interleaveSchedule(docs: DataFrame, weights: Map[String, Int],
                         take: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF("lang", "wt")
    val ranked = docs.select(col("doc_id"), col("lang"))
      .join(broadcast(w), Seq("lang"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
      .withColumn("virtual_e6", expr("rk * 1000000L div wt"))
    val head = ranked
      .orderBy(col("virtual_e6"), col("lang"), col("doc_id")).limit(take)
    head
      .withColumn("position", row_number().over(
        Window.orderBy(col("virtual_e6"), col("lang"), col("doc_id"))))
      .select(col("position"), col("lang"), col("doc_id"), col("virtual_e6"))
      .orderBy(col("position"))
  }

  /** Scalable running token total in document order — the prefix-sum
    * primitive behind token-budget sharding. A naive
    * `sum() over (order by doc_id)` collapses the corpus into ONE window
    * partition (single-task at any scale); this is the textbook two-level
    * scan instead: coarse doc_id buckets get their totals via an ordinary
    * partial-aggregated groupBy, the |corpus|/bucketWidth bucket offsets
    * take one genuinely tiny single-partition window, and the per-row
    * cumsum runs in windows PARTITIONED by bucket — every stage parallel,
    * identical output to the global window (the oracle runs that form).
    *
    * Sizing at scale: pick `bucketWidth` ≈ sqrt(corpus id range) so BOTH
    * levels stay bounded (~10⁵·⁵ rows each at 10¹¹ documents); the
    * default suits test-scale corpora.
    */
  def withTokenPrefix(docs: DataFrame, bucketWidth: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("_b", floor(col("doc_id") / bucketWidth))
    val offsets = toks.groupBy(col("_b")).agg(sum(col("n_tokens")).as("_bt"))
      .withColumn("_off", coalesce(
        sum(col("_bt")).over(Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_bt")
    val inBucket = Window.partitionBy(col("_b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(offsets), Seq("_b"))
      .withColumn("cum_tokens", col("_off") + sum(col("n_tokens")).over(inBucket))
      .drop("_b", "_off")
  }

  /** Token-budget shard assignment: documents fill shard 0 until `budget`
    * tokens, then shard 1, … — the deterministic sharding a training run
    * uses to cut a corpus into equal-work files. A document belongs to the
    * shard its FIRST token lands in (integer division, no float drift).
    */
  def shardByTokenBudget(docs: DataFrame, budget: Long,
                         bucketWidth: Long = 1000L): DataFrame =
    withTokenPrefix(docs, bucketWidth)
      .withColumn("shard", expr(s"(cum_tokens - n_tokens) div $budget").cast("int"))

  /** Train/serve distribution-drift census — the data-quality gate a
    * continuously-fed training pipeline runs on every incoming batch:
    * freeze `nBuckets` equal-population buckets on the REFERENCE
    * distribution (exact integer-ceil rank boundaries over the per-value
    * histogram — the `agg_percentiles_hist` machinery, so the boundary
    * pass shuffles |distinct values| rows, never the corpus), then count
    * both sides into those frozen buckets and report per-10k proportions
    * and their absolute shift. All integer arithmetic — no PSI logs (libm
    * differs across engines, and the per-bucket shift table is what an
    * alerting rule thresholds anyway; Σ|shift| over buckets is 2×10⁴·TV
    * distance, recoverable by the caller with one sum).
    *
    * Scale: one histogram aggregation on the reference, a cumulative
    * window over that BOUNDED histogram, a broadcast 9-value boundary
    * array, and one map-side-combined bucket census over ref ∪ cand.
    */
  def driftCensus(ref: DataFrame, cand: DataFrame, valueCol: String,
                  nBuckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = ref.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("c")).over(wOrd))
    val nRef = hist.agg(sum(col("c")).as("n"))
    // boundary_i = min v whose cumulative count reaches ceil(i·n/nBuckets)
    val bounds = cum.crossJoin(broadcast(nRef))
      .select(col("v"), col("cum"), col("n"),
        explode(expr(s"sequence(1, ${nBuckets - 1})")).as("i"))
      .filter(col("cum") >= expr(s"(i * n + ${nBuckets - 1}) div $nBuckets"))
      .groupBy(col("i")).agg(min(col("v")).as("b"))
      .agg(expr("transform(sort_array(collect_list(struct(i, b))), x -> x.b)").as("bs"))
    val tagged = ref.select(col(valueCol).cast("long").as("v"), lit("ref").as("side"))
      .unionByName(cand.select(col(valueCol).cast("long").as("v"), lit("cand").as("side")))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tagged.crossJoin(broadcast(bounds))
      .withColumn("bucket", size(expr("filter(bs, b -> b < v)")) + 1)
      .groupBy(col("bucket"))
      .agg(count(when(col("side") === "ref", 1)).as("n_ref"),
        count(when(col("side") === "cand", 1)).as("n_cand"))
      .withColumn("t_ref", sum(col("n_ref")).over(wAll))
      .withColumn("t_cand", sum(col("n_cand")).over(wAll))
      .select(col("bucket"), col("n_ref"), col("n_cand"),
        expr("n_ref * 10000 div t_ref").as("pct_ref"),
        expr("n_cand * 10000 div t_cand").as("pct_cand"),
        expr("abs(n_ref * 10000 div t_ref - n_cand * 10000 div t_cand)")
          .as("shift_per_10k"))
  }

  /** Systematic weighted sampling — the deterministic, PRNG-free form of
    * weighted sampling a reproducible data pipeline wants: lay the corpus
    * out on its exact cumulative token-weight axis (the scalable
    * [[withTokenPrefix]] two-level prefix sum — no global window), then
    * take the `n` midpoint positions p_k = (2k+1)·W/(2n), k < n. Each
    * document's pick count is the number of positions inside its weight
    * interval [cum−w, cum) — EXACT integer arithmetic via scaled
    * positions (y = 2n·x; count of odd multiples of W below y is
    * ((y−1) div W + 1) div 2, guarded at y=0 where floor- and
    * truncating-division engines disagree). Inclusion multiplicity is
    * proportional to weight, heavy docs (w > W/n) are ALWAYS picked, and
    * the total pick count is exactly n — the properties survey sampling
    * buys from systematic designs, with bit-identical output on any
    * engine and any partitioning.
    *
    * Bounds: scaled positions need 2n·W < 2^63 — fine through n = 10^4
    * samples over a 10^13-token (≈100 TB) corpus.
    */
  def systematicSample(docs: DataFrame, n: Long,
                       bucketWidth: Long = 1000L): DataFrame = {
    require(n > 0, "sample size must be positive")
    val pref = withTokenPrefix(docs, bucketWidth)
    val tot = pref.agg(max(col("cum_tokens")).as("w_total"))
    def picksBelow(y: String): String =
      s"(CASE WHEN $y <= 0 THEN 0 ELSE (($y - 1) div w_total + 1) div 2 END)"
    pref.crossJoin(broadcast(tot))
      .withColumn("hi_y", expr(s"2 * $n * cum_tokens"))
      .withColumn("lo_y", expr(s"2 * $n * (cum_tokens - n_tokens)"))
      .withColumn("n_picks", expr(s"${picksBelow("hi_y")} - ${picksBelow("lo_y")}"))
      .filter(col("n_picks") > 0)
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"), col("n_picks"))
  }

  /** Benchmark decontamination: for every training document, the exact
    * number of its distinct word-n-gram shingles that appear ANYWHERE in
    * the held-out (val/test) split, plus the contamination ratio — the
    * check that keeps eval numbers honest (a train doc overlapping the
    * benchmark inflates scores without improving the model).
    *
    * Scale shape: the benchmark shingle set is `|heldout| × shingles`
    * distinct hashes — orders of magnitude smaller than the corpus — so
    * the semi-join broadcasts it in practice; the per-doc counts are one
    * partial-aggregated groupBy(doc_id). No all-pairs anything.
    */
  def decontaminationReport(docs: DataFrame, n: Int = 3,
                            valPct: Int = 5, testPct: Int = 5,
                            tau: Double = 0.1): DataFrame = {
    // stage boundary: the split+shingle pass feeds three consumers (the
    // benchmark set, the hit join, and the final per-doc select) — without
    // materialization each re-tokenizes the corpus. Scratch parquet, not
    // cache: the result DataFrame outlives this call, so a cache here
    // would leak (Curate.curateCorpus can use cache only because it
    // collects its bounded census and unpersists before returning).
    val stage = graft.stages.TempDirs.scratch("graft_decon_")
    Dedup.withShingleHashes(TextAnalysis.withSplit(docs, valPct, testPct), n)
      .select(col("doc_id"), col("split"), col("hbase"))
      .write.mode("overwrite").parquet(stage)
    val shingled = docs.sparkSession.read.parquet(stage)
    val bench = shingled.filter(col("split") =!= "train")
      .select(explode(col("hbase")).as("h")).distinct()
    val train = shingled.filter(col("split") === "train")
    val hits = train
      .select(col("doc_id"), explode(col("hbase")).as("h"))
      .join(bench, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    train.select(col("doc_id"), size(col("hbase")).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_shingles"))
      .withColumn("is_contaminated", col("contamination") >= tau)
  }

  /** [[temperatureMixture]] APPLIED: each source's integer budget becomes
    * a per-ten-thousand hash-bucket threshold (`⌊10⁴·budget/n⌋` — exact
    * integer arithmetic, no float thresholds) and documents are kept by
    * salted md5 bucket, giving a deterministic materialization of the
    * computed mix. The census reports target vs achieved per source —
    * hash granularity makes the achieved count binomial around the
    * target, which is exactly what `sample()` would give, minus the
    * nondeterminism. One narrow filter over the corpus after two bounded
    * aggregates; the mix table is |sources| rows, broadcast.
    */
  def applyMixture(docs: DataFrame, budget: Long, salt: String = "mix:"): DataFrame = {
    val mix = temperatureMixture(docs, budget)
      .select(col("lang"), col("n_docs"), col("n_budgeted"),
        expr("10000 * n_budgeted div n_docs").as("threshold"))
    val bucket = expr(
      s"CAST(conv(substring(md5(concat('$salt', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 10000")
    // one corpus pass: keep/drop decided inline and counted in the same
    // census aggregate, so the mix lineage is built exactly once and no
    // join-back is needed (a filter + re-join form costs the mixture
    // aggregates twice). The join is NULL-SAFE (<=>): the mixture's
    // groupBy keeps a NULL-lang stratum, and a null-unsafe equi-join
    // would silently drop both it and its documents from the census
    // (diverging from the oracle's LEFT JOIN, which preserves it).
    val mixR = mix.withColumnRenamed("lang", "_mix_lang")
    docs.join(broadcast(mixR), col("lang") <=> col("_mix_lang"))
      .groupBy(col("_mix_lang"), col("n_docs"), col("n_budgeted"))
      .agg(count(when(bucket < col("threshold"), lit(1))).as("n_sampled"))
      .select(col("_mix_lang").as("lang"), col("n_docs"), col("n_budgeted"),
        col("n_sampled"))
  }

  /** Equal-population range sharding: documents are cut into `shards`
    * contiguous ranges of the sort key (text length, ties to doc_id) with
    * populations as equal as integer division allows — `ntile` semantics,
    * which Spark and DuckDB define identically, so per-shard boundary
    * stats are oracle-exact. The census (count, key lo/hi per shard) IS
    * the shard-boundary table a writer feeds to `repartitionByRange`.
    *
    * A literal `ntile() OVER (ORDER BY …)` plans a SINGLE-partition
    * WindowExec — every corpus row through one task, the one shape this
    * engine bans. But ntile is pure integer arithmetic on the global rank
    * (N rows, n tiles, q = N div n, r = N mod n: the first r tiles hold
    * q+1 rows), so this uses the same two-level exact-rank composition as
    * [[withTokenPrefix]]: coarse key buckets get counts via an ordinary
    * partial-aggregated groupBy, the tiny bucket-offset table takes the
    * only single-partition window (|key range|/bucketWidth rows, bounded),
    * and per-row ranks come from windows PARTITIONED by bucket — every
    * corpus-scale stage parallel, output bit-identical to the oracle's
    * real ntile.
    *
    * Sizing at scale: `bucketWidth` ≈ key range / desired parallelism;
    * the default suits char-length keys (range ~1e2..1e6).
    */
  def rangeShardCensus(docs: DataFrame, shards: Int = 8,
                       bucketWidth: Long = 64L): DataFrame =
    rangeStages(docs.select(col("doc_id"), col("n_chars")), "n_chars",
      shards, bucketWidth.toDouble, "chars")

  /** The generic form of [[rangeShardCensus]]: equal-population ntile
    * stages over ANY numeric key column (text length, a difficulty score,
    * a quality signal), same two-level exact-rank machinery. Output:
    * `(shard, n_docs, lo_<prefix>, hi_<prefix>)`.
    */
  def rangeStages(docs: DataFrame, keyCol: String, shards: Int,
                  bucketWidth: Double, outPrefix: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = docs.select(col("doc_id"), col(keyCol))
      .withColumn("_b", floor(col(keyCol) / bucketWidth))
    // _off (exclusive prefix) and _n (grand total) ride the SAME tiny
    // single-partition window pass — a separate total aggregate would
    // re-execute the bucket-count lineage (2 extra exchanges for 1 number)
    val bucketW = Window.orderBy(col("_b"))
    val offsets = keyed.groupBy(col("_b")).agg(count(lit(1)).as("_bc"))
      .withColumn("_off", coalesce(
        sum(col("_bc")).over(bucketW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("_n", sum(col("_bc")).over(bucketW.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .drop("_bc")
    val inBucket = Window.partitionBy(col("_b"))
      .orderBy(col(keyCol), col("doc_id"))
    // ntile from rank k (1-based): ranks ≤ (q+1)·r fall in the r wide
    // tiles, the rest in width-q tiles; ceil division is (x + d - 1) div d.
    // The else-branch divides by q, which is 0 only when N < shards — and
    // then every rank satisfies the first branch, so CASE never evaluates
    // the division (ANSI-safe via the greatest() guard regardless).
    keyed.join(broadcast(offsets), Seq("_b"))
      .withColumn("_rk", col("_off") + row_number().over(inBucket))
      .withColumn("shard", expr(
        s"""CAST(CASE WHEN _rk <= (_n div $shards + 1) * (_n % $shards)
           |  THEN (_rk + _n div $shards) div (_n div $shards + 1)
           |  ELSE _n % $shards
           |       + (_rk - (_n div $shards + 1) * (_n % $shards)
           |          + greatest(_n div $shards, 1) - 1)
           |         div greatest(_n div $shards, 1)
           |END AS INT)""".stripMargin))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(keyCol)).as(s"lo_$outPrefix"),
        max(col(keyCol)).as(s"hi_$outPrefix"))
  }

  /** Temperature-scaled training mixture: per-source sampling weights
    * proportional to `n^(1/2)` — the standard way to up-weight low-resource
    * languages/sources without letting the biggest source dominate
    * (temperature T=2 ⇒ exponent 1/2). The exponent is fixed at 1/2
    * deliberately: `sqrt` is correctly-rounded IEEE and therefore
    * cross-engine exact, while a general `pow` (libm) is not — the
    * determinism boundary documented in ARCHITECTURE.md. Outputs, per
    * source: raw count, unnormalized weight, mixture share, and the
    * integer document budget `floor(share * budget)`.
    *
    * Scale shape: one map-side-combining count per source, a broadcast of
    * the one-row total, per-row arithmetic after that.
    */
  def temperatureMixture(docs: DataFrame, budget: Long): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", sqrt(col("n_docs").cast("double")))
    // the weight total is a FLOAT sum, and float addition is
    // order-sensitive — fold the per-source weights in sorted source
    // order (== DuckDB `list_sum(list(w ORDER BY lang))`), never a
    // partial-aggregated sum() whose order the planner picks
    val total = counts.agg(expr(
      """aggregate(transform(sort_array(collect_list(struct(lang, weight))),
           x -> x.weight), 0D, (acc, w) -> acc + w)""").as("w_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("weight") / col("w_total"))
      .withColumn("n_budgeted", floor(col("share") * budget).cast("long"))
      .select(col("lang"), col("n_docs"), col("weight"), col("share"), col("n_budgeted"))
  }

  /** Largest-remainder (Hamilton) apportionment of a fixed document budget
    * across strata: base_i = ⌊B·n_i/N⌋, then the B − Σbase shortfall goes
    * one each to the strata with the LARGEST remainders (B·n_i mod N, ties
    * to stratum order) — so Σ alloc_i = B EXACTLY, every stratum is within
    * 1 of its real share, and the result is pure integer arithmetic (the
    * floor-only [[temperatureMixture]] budget under-allocates by up to
    * |strata|−1 documents; this is the standard fix, same algorithm as
    * parliamentary seat apportionment). All windows run over the BOUNDED
    * per-stratum aggregate (|langs| rows), never the corpus.
    */
  def apportionBudget(docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.orderBy(col("rem").desc, col("lang").asc_nulls_first)
    counts
      .withColumn("n_total", sum(col("n_docs")).over(wAll))
      .withColumn("base", expr(s"$budget * n_docs div n_total"))
      .withColumn("rem", expr(s"$budget * n_docs % n_total"))
      .withColumn("short", lit(budget) - sum(col("base")).over(wAll))
      .withColumn("rk", row_number().over(wRank))
      .select(col("lang"), col("n_docs"),
        (col("base") + when(col("rk") <= col("short"), lit(1L)).otherwise(lit(0L)))
          .as("n_alloc"))
  }

  /** Deterministic GLOBAL corpus shuffle — the last step before training
    * ingestion: every document gets a contiguous global position in a
    * pseudo-random (salted-md5) order plus a round-robin shard, so a
    * trainer streaming shard files in position order sees a fixed, evenly
    * interleaved permutation of the corpus. `orderBy(rand())` cannot do
    * this job: it is neither rerun-stable nor partitioning-stable, and a
    * global `row_number()` window collapses the corpus onto one task.
    *
    * Scale shape: the md5 priority is one narrow projection; `orderBy` on
    * it is a range-partitioned TOTAL sort (sampled boundaries, each
    * partition sorted independently — the scalable global-order machinery);
    * positions are then per-partition offsets + local indexes
    * (`zipWithIndex`: one O(#partitions) count job, one narrow map — no
    * corpus-scale collapse). Round-robin on position balances shards to
    * ±1 document by construction.
    */
  def globalShuffle(docs: DataFrame, nShards: Int,
                    salt: String = "shuffle:"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = docs.sparkSession
    val sorted = docs
      .select(col("doc_id"), col("lang"))
      .withColumn("_h", expr(
        s"CAST(conv(substring(md5(concat('$salt', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
      // doc_id tie-break: the 60-bit hash prefix can collide at corpus
      // scale and the permutation must stay a total order
      .orderBy(col("_h"), col("doc_id"))
    val schema = StructType(sorted.schema.fields :+
      StructField("position", LongType, nullable = false))
    val withPos = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(withPos, schema)
      .withColumn("shard", ((col("position") - 1) % nShards).cast("int"))
      .select(col("position"), col("shard"), col("doc_id"), col("lang"))
  }

  /** Greedy maximum-coverage data selection — the coreset/facility-
    * location family's workhorse (Nemhauser's 1−1/e guarantee): pick k
    * documents maximizing the number of DISTINCT shingles covered, one
    * document per round, marginal gain recomputed against everything
    * already covered. The selection is inherently sequential, so each
    * round pays exactly one bounded driver action (the 1-row argmax with
    * gain DESC, doc ASC tie-break); the gain table itself is one
    * anti-join + map-side-combined count over the shingle postings (built
    * once, lineage-cut), and the covered set grows by at most the chosen
    * document's shingles per round — never corpus-quadratic.
    *
    * Returns (round, doc_id, gain, covered_total); covered_total is the
    * exact covered-universe size after each pick (gains telescope because
    * postings are per-doc distinct).
    */
  def greedyCoverage(docs: DataFrame, k: Int, n: Int = Dedup.defaultShingle): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val posting = Dedup.withShingleHashes(docs, n)
      .select(col("doc_id"), explode(col("hbase")).as("h"))
      .localCheckpoint()
    var covered = spark.emptyDataset[Long].toDF("h")
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    var coveredTotal = 0L
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val best = posting.join(covered, Seq("h"), "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val doc = best.head.getLong(0)
        val gain = best.head.getLong(1)
        coveredTotal += gain
        picks += ((r, doc, gain, coveredTotal))
        covered = covered
          .unionByName(posting.filter(col("doc_id") === doc).select(col("h")))
          .distinct().localCheckpoint()
      }
      r += 1
    }
    picks.toSeq.toDF("round", "doc_id", "gain", "covered_total")
  }

  /** DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    * score every raw document by how target-like its hashed-bigram feature
    * distribution is, the selection signal "sample raw data that looks like
    * the target domain". Features are md5-hashed bigrams in 1024 buckets
    * (feature hashing, the paper's trick to keep the LM product tractable);
    * per-bucket weight is the add-one-smoothed log-likelihood ratio
    * log p_target(b)/p_raw(b), and a document's weight is the sum over its
    * bigram OCCURRENCES (the bag-of-features log importance weight).
    *
    * Exactness: the ratio is cross-multiplied — λ(b) = ±floor(log₂) of
    * n_raw·(c_t+1) vs n_t·(c_r+1) via the binary-length kernel
    * (`length(bin(a div b)) − 1`, products through DECIMAL(38,0) so token
    * totals up to 1e12 never overflow), sign-split for ratios < 1. Integer
    * bits quantize the log to whole bits — coarse per feature, but summed
    * over hundreds of bigrams per document the ranking matches the float
    * form closely, and it is hash-exact cross-engine.
    *
    * Scale: one bigram explode (linear in corpus tokens), two map-side
    * combined groupBys that contract to ≤1024 buckets, the λ table is a
    * 1024-row broadcast joined back onto the doc-feature stream, one
    * per-doc sum. No windows, no corpus broadcast, no driver collect.
    * Returns the per-language census: doc counts, total/mean weight
    * (1e2, truncation sign-split so Spark `div` == DuckDB `//`), and how
    * many docs the weight>0 rule would select — target-language docs
    * should dominate the selected set, the self-check of the method.
    */
  def dsirCensus(docs: DataFrame, targetLang: String = "en",
                 buckets: Int = 1024): DataFrame = {
    val toks = TextAnalysis.withTokens(docs)
    val bi = toks.select(col("doc_id"), col("lang"), explode(expr(
        """CASE WHEN size(toks) < 2 THEN array()
           ELSE transform(sequence(1, size(toks) - 1),
                  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
           END""")).as("bg"))
      .select(col("doc_id"), col("lang"),
        expr(s"CAST(conv(substring(md5(bg), 1, 8), 16, 10) AS BIGINT) % $buckets")
          .as("b"))
    val raw = bi.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = bi.filter(col("lang") === targetLang)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val totals = raw.agg(sum(col("cr")).as("nr")).crossJoin(
      tgt.agg(sum(col("ct")).as("nt")))
    // λ per bucket: ±floor(log2(nr·(ct+1) / nt·(cr+1))), exact via binary
    // length on the DECIMAL-safe cross products
    val lam = raw.join(tgt, Seq("b"), "left")
      .withColumn("ct", coalesce(col("ct"), lit(0L)))
      .crossJoin(broadcast(totals))
      .withColumn("a", expr("CAST(nr AS DECIMAL(38,0)) * (CAST(ct AS DECIMAL(38,0)) + 1)"))
      .withColumn("c", expr("CAST(nt AS DECIMAL(38,0)) * (CAST(cr AS DECIMAL(38,0)) + 1)"))
      .withColumn("lam", expr(
        """CASE WHEN a >= c THEN CAST(length(bin(CAST(a div c AS BIGINT))) - 1 AS BIGINT)
                ELSE -CAST(length(bin(CAST(c div a AS BIGINT))) - 1 AS BIGINT) END"""))
      .select(col("b"), col("lam"))
    val docW = bi.join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("lam")).as("w"))
    docs.select(col("doc_id"), col("lang"))
      .join(docW.select(col("doc_id"), col("w")), Seq("doc_id"), "left")
      .withColumn("w", coalesce(col("w"), lit(0L)))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("w_sum"),
        count(when(col("w") > 0, lit(1))).as("n_selected"))
      .withColumn("w_mean_e2", expr(
        """CASE WHEN w_sum < 0 THEN -((-(100 * w_sum)) div n_docs)
                ELSE (100 * w_sum) div n_docs END"""))
      .select(col("lang"), col("n_docs"), col("w_sum"), col("w_mean_e2"),
        col("n_selected"))
      .orderBy(col("lang"))
  }

  /** Rendezvous (highest-random-weight) resharding churn census — the
    * decision table for growing a sharded layout from 8 to 9 shards:
    * HRW assigns key k to argmax_s md5(k:s), so adding shard 9 moves ONLY
    * the keys whose new shard wins (≈1/9 of keys), while `hash mod n`
    * reshuffles ≈8/9 of them. Emits one row per scheme with the measured
    * move fraction (permille) — the "why consistent hashing" number.
    *
    * Scale: the key set contracts first (distinct user_id — map-side
    * combined), then a 9-row broadcast explode and one groupBy(key) with
    * two conditional lexicographic argmaxes (`max(struct(hash, shard))`
    * — partial-aggregable, no window). Both schemes ride the same pass.
    */
  def rendezvousReshardCensus(events: DataFrame): DataFrame = {
    val keys = events.select(col("user_id")).distinct()
    val shards = keys.sparkSession.range(0, 9).select(col("id").as("s"))
    val hrw = keys.crossJoin(broadcast(shards))
      .withColumn("h", expr(
        "md5(concat(CAST(user_id AS STRING), ':', CAST(s AS STRING)))"))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("s") < 8, struct(col("h"), col("s")))).getField("s").as("s8"),
        max(struct(col("h"), col("s"))).getField("s").as("s9"))
    val hrwRow = hrw.agg(count(lit(1)).as("n_keys"),
        count(when(col("s8") =!= col("s9"), lit(1))).as("n_moved"))
      .select(lit("hrw").as("scheme"), col("n_keys"), col("n_moved"))
    val modRow = keys
      .withColumn("hk", expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .agg(count(lit(1)).as("n_keys"),
        count(when(col("hk") % 8 =!= col("hk") % 9, lit(1))).as("n_moved"))
      .select(lit("mod").as("scheme"), col("n_keys"), col("n_moved"))
    hrwRow.unionByName(modRow)
      .withColumn("moved_permille", expr("1000 * n_moved div n_keys"))
      .orderBy(col("scheme"))
  }
}
