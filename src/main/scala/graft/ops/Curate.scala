package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the composed pipeline every
  * large-scale data-prep run executes, built entirely from this engine's
  * own operators:
  *
  *   1. exact dedup: keep each text's canonical (lowest-id) copy;
  *   2. near-dup removal: MinHash-LSH pairs, drop the higher id of every
  *      verified pair (canonical survives);
  *   3. quality gate: token count / type-token ratio / mean token length;
  *   4. language bucketing: stopword-ratio argmax.
  *
  * Output is the per-language survivor census (docs, total tokens) — the
  * numbers a training-mix planner consumes. Shuffle inventory is exactly
  * the sum of its parts: one md5 groupBy, one band self-join + verify, the
  * final language groupBy; the quality/language features are pure column
  * math on the survivor scan.
  */
object Curate {

  /** Stages 1+2: the deduplicated survivor set (exact-dup canonicals minus
    * near-dup losers). This is the pipeline's expensive stage boundary —
    * everything downstream re-reads it, so callers materialize it (cache
    * within one query, or a [[graft.stages.MergeTable]] across runs).
    */
  def survivorSet(docs: DataFrame): DataFrame = {
    val canonical = Dedup.exactDuplicateGroups(docs)
      .select(col("canonical_doc").as("doc_id"))
    val uniqueDocs = docs.join(canonical, Seq("doc_id"), "left_semi")
    val nearDupLosers = Dedup.minhashLshPairs(uniqueDocs)
      .select(col("doc_b").as("doc_id")).distinct()
    uniqueDocs.join(nearDupLosers, Seq("doc_id"), "left_anti")
  }

  /** Stages 3+4 over a materialized survivor set: quality gate, language
    * bucketing, and the per-language census a training-mix planner
    * consumes. Census keyed by (labeled, predicted): the off-diagonal
    * buckets are the mislabel/misdetection census a curation run reports
    * (on this corpus the text is synthetic English-ish vocabulary under
    * every label, so the heuristic correctly predicts 'en' throughout).
    */
  def censusOf(survivors: DataFrame): DataFrame = {
    val quality = TextAnalysis.qualityScore(survivors)
      .filter(col("is_quality"))
      .select(col("doc_id"), col("n_tokens"))
    val lang = TextAnalysis.languageId(survivors)
      .select(col("doc_id"), col("labeled_lang"), col("predicted_lang"))
    quality.join(lang, Seq("doc_id"))
      .groupBy(col("labeled_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("bigint")).as("total_tokens"))
  }

  def curateCorpus(docs: DataFrame): DataFrame = {
    // stage boundary: quality, language-id, and the final join all read the
    // survivor set; without materialization each would re-run the whole
    // dedup lineage. Across runs this is where the layer persists to
    // storage ([[curateCorpusThrough]]); within one query, cache.
    val survivors = survivorSet(docs).cache()
    val census = censusOf(survivors)

    // the census is bounded (|langs|² rows): materialize it eagerly so the
    // corpus-sized survivor cache can be RELEASED before returning, instead
    // of pinning executor storage for the rest of the session
    val rows = census.collect().toSeq
    survivors.unpersist()
    docs.sparkSession.createDataFrame(
      docs.sparkSession.sparkContext.parallelize(rows, 1), census.schema)
  }

  /** The same pipeline run THROUGH a storage boundary: the survivor set
    * is recomputed over table ∪ batch and snapshot-committed, and the
    * census is computed from what storage actually holds. This is the
    * production shape: the survivor table is the durable artifact other
    * jobs (tokenization, sharding, training-mix sampling) read, and the
    * census is reproducible from it at any time.
    *
    * Dedup is CROSS-batch, not within-batch (driver ADVICE.md finding):
    * an upsert of only the current batch's survivors would let the
    * durable table accumulate near-duplicates across incremental runs —
    * a doc committed as a survivor earlier is never challenged by a
    * later batch's canonical. Recomputing over table ∪ batch (batch wins
    * on doc_id overlap) lets a new batch evict a previously committed
    * survivor, and re-running any batch converges: survivors are a
    * deterministic function of the union, and the snapshot commit is
    * atomic. At 100 TB the recompute is corpus-scale per batch — the
    * scale path is the same banded LSH join with the table side's band
    * keys persisted as an index, which turns each run into
    * batch-vs-index instead of corpus-vs-corpus; the semantics committed
    * here are the contract that index must preserve.
    */
  /** Per-source document cap — the C4/CommonCrawl "domain cap" curation
    * rule: no single source (domain, crawl host, data vendor) may dominate
    * the training mix, so each source keeps only its `cap` best documents
    * (longest text, ties to the lower doc_id — in production the rank key
    * is a quality score; the operator shape is identical) and the census
    * reports what the cap cost per source.
    *
    * Scale shape: one rank window partitioned by source. A hot domain
    * (millions of docs) makes that partition the straggler; the remedy is
    * the same bounded-buffer ladder as top-k similarity — a
    * [[graft.functions.TopKAggregator]] per source bounds every shuffle
    * buffer at `cap` rows — which composes because rank-then-filter and
    * per-group top-k are the same operator. The census itself is a
    * |sources|-row aggregate.
    */
  def domainCapCensus(docs: DataFrame, cap: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.withColumn("_r", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("_r") <= cap, lit(1))).as("n_kept"),
        sum(when(col("_r") <= cap, col("n_chars")).otherwise(lit(0L))).as("kept_chars"),
        max(when(col("_r") <= cap, col("n_chars"))).as("max_kept_chars"),
        min(when(col("_r") <= cap, col("n_chars"))).as("min_kept_chars"))
  }

  /** [[domainCapCensus]] through the single-pass bounded
    * [[graft.functions.TopKAggregator]] instead of a rank window — the
    * hot-domain scale ladder: a domain with millions of documents makes
    * the window partition the straggler (it sorts EVERY doc of the
    * domain), while the aggregator ships at most `cap` rows per (source ×
    * map partition) through the shuffle. Output contract identical to the
    * window form (same oracle); ties break (n_chars desc, doc_id asc) in
    * both.
    */
  def domainCapCensusAgg(docs: DataFrame, cap: Int = 50): DataFrame = {
    import graft.functions.TopKAggregator
    val spark = docs.sparkSession
    import spark.implicits._
    val kept = docs.select(col("source"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)]
      .map { case (s, id, n) => (s, TopKAggregator.Scored(id, n.toDouble)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopKAggregator.topK(cap).toColumn)
      .flatMap { case (s, top) => top.map(t => (s, t.id)) }
      .toDF("source", "doc_id")
    val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    kept.join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("kept_chars"),
        max(col("n_chars")).as("max_kept_chars"),
        min(col("n_chars")).as("min_kept_chars"))
      .join(totals, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_kept"), col("kept_chars"),
        col("max_kept_chars"), col("min_kept_chars"))
  }

  def curateCorpusThrough(docs: DataFrame, table: graft.stages.MergeTable): DataFrame = {
    val spark = docs.sparkSession
    // pin the exact snapshot this recompute reads, and make the commit
    // CAS against it: a concurrent curation landing in between fails this
    // run loudly instead of having its survivors silently overwritten
    val base = table.currentVersion
    val existing = base.map(v => table.readVersion(spark, v)).getOrElse(
      table.read(spark, docs.schema))
    val unioned = docs.unionByName(
      existing.join(docs.select("doc_id"), Seq("doc_id"), "left_anti"))
    table.replace(survivorSet(unioned), expectedBase = Some(base))
    censusOf(table.read(spark, docs.schema))
  }
}
