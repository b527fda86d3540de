package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketching: KMV (k-minimum-values).
  *
  * The classic engine sketches (HyperLogLog behind
  * `approx_count_distinct`) hash with engine-private functions, so their
  * estimates can never be conformance-checked across engines. KMV gives the
  * same O(k) summary guarantee — keep the k smallest uniform hashes of the
  * distinct values; estimate ≈ (k-1) / max_normalized_kth_min — but built on
  * md5, so Spark and the DuckDB oracle produce the SAME estimate bit for
  * bit. KMV summaries are mergeable (union the sets, keep k smallest), the
  * property that makes the sketch distributable at 100 TB.
  *
  * This formulation uses a rank window over the hashed distinct values —
  * one shuffle on (group, hash order). A `TypedImperativeAggregate` buffer
  * of k longs is the single-pass production variant; the window form is the
  * oracle-transparent reference implementation.
  */
object Sketch {

  /** 2^60 — hash space of the 15-hex-digit md5 prefix. */
  private val HashSpace = math.pow(2.0, 60)

  /** Per-group KMV distinct estimate of `valueCol`, alongside the exact
    * count for error inspection.
    * Output: groupCols*, kth_min_hash, estimate (double), exact (long).
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    val hashed = df
      .select((groupCols.map(col) :+ col(valueCol)): _*)
      .distinct()
      .withColumn("_h", expr(
        s"CAST(conv(substring(md5(CAST($valueCol AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_h"))
    val ranked = hashed
      .withColumn("_rank", row_number().over(w))
    val kth = ranked
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(when(col("_rank") === k, col("_h"))).as("kth_min_hash"),
        count(lit(1)).as("exact"))
    kth.withColumn("estimate", kmvEstimate(col("kth_min_hash"), col("exact"), k))
  }

  /** THE kth-min estimator — `(k−1) / (kth_min / 2^60)`, falling back to
    * the exact size when the set never filled the sketch — shared by
    * [[kmvDistinct]] and [[kmvSetOps]] so the formula cannot drift.
    */
  private def kmvEstimate(kthMin: org.apache.spark.sql.Column,
                          sizeWhenUnfilled: org.apache.spark.sql.Column,
                          k: Int): org.apache.spark.sql.Column =
    when(kthMin.isNull, sizeWhenUnfilled.cast("double"))
      .otherwise(lit((k - 1).toDouble) / (kthMin / lit(HashSpace)))

  /** KMV SET OPERATIONS — the Theta-sketch capability: estimate
    * |A ∪ B|, Jaccard(A, B), and |A ∩ B| for two sets from their O(k)
    * sketches alone, never the sets (audience-overlap analytics at 100 TB:
    * sketches are kilobytes, the sets are the corpus).
    *
    * Estimators (Beyer et al. / theta-sketch standard): the union sketch
    * is the k smallest hashes of the two sketches' union (exactly the KMV
    * merge law, so it is itself a valid sketch of A ∪ B); its kth minimum
    * gives |A ∪ B| as in [[kmvDistinct]]; the fraction of union-sketch
    * members present in BOTH input sketches estimates Jaccard; and
    * |A ∩ B| = Jaccard × |A ∪ B|. Exact values are computed alongside —
    * the output doubles as the sketch-accuracy report.
    *
    * Everything after the per-group distinct + rank window is ≤ 2k rows,
    * so the set algebra costs nothing at any corpus scale.
    */
  def kmvSetOps(df: DataFrame, groupCol: String, valueCol: String,
                groupA: String, groupB: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .filter(col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("_g"), col(valueCol).as("_v")).distinct()
      .withColumn("_h", expr(
        s"CAST(conv(substring(md5(CAST(_v AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
    val wg = Window.partitionBy(col("_g")).orderBy(col("_h"))
    // the sketches are ≤ 2k rows BY CONSTRUCTION — collect them once so
    // the set algebra below runs on a local relation instead of
    // re-executing the corpus-scale distinct + rank lineage per consumer
    // (union sketch, two membership sides = 3 extra passes otherwise)
    val sketchRows = hashed
      .withColumn("_r", row_number().over(wg)).filter(col("_r") <= k)
      .select(col("_g"), col("_h"))
      .as[(String, Long)].collect().toSeq
    val sketches = sketchRows.toDF("_g", "_h")
    val unionK = sketches.select(col("_h")).distinct()
      .withColumn("_r", row_number().over(Window.orderBy(col("_h"))))
      .filter(col("_r") <= k)
    val marked = unionK
      .join(sketches.filter(col("_g") === groupA).select(col("_h"), lit(1).as("_ia")),
        Seq("_h"), "left")
      .join(sketches.filter(col("_g") === groupB).select(col("_h"), lit(1).as("_ib")),
        Seq("_h"), "left")
      .agg(
        max(when(col("_r") === k, col("_h"))).as("kth_min_hash"),
        count(lit(1)).as("sketch_size"),
        sum(when(col("_ia").isNotNull && col("_ib").isNotNull, 1L).otherwise(0L))
          .as("n_shared"))
    // the exact reference pays the one remaining corpus pass — it exists
    // only as the accuracy report (production consumers read the estimates)
    val exact = hashed.groupBy(col("_v"))
      .agg(countDistinct(col("_g")).as("_ng"))
      .agg(count(lit(1)).as("exact_union"),
        count(when(col("_ng") === 2, lit(1))).as("exact_intersection"))
    marked.crossJoin(exact)
      .withColumn("est_union", kmvEstimate(col("kth_min_hash"), col("sketch_size"), k))
      .withColumn("est_jaccard",
        col("n_shared").cast("double") / col("sketch_size"))
      .withColumn("est_intersection", col("est_jaccard") * col("est_union"))
      .select(col("sketch_size"), col("n_shared"),
        col("est_union"), col("est_jaccard"), col("est_intersection"),
        col("exact_union"), col("exact_intersection"))
  }

  /** Per-group order statistics from a BOTTOM-K-BY-HASH sample — the
    * deterministic, mergeable form of uniform sampling (keep the k rows
    * with the smallest md5 priorities; merging partitions = union then
    * keep k smallest, the KMV property), which is how quantiles are
    * estimated at scales where sorting the group is off the table. An
    * engine-private `TABLESAMPLE`/`rand()` can never be
    * conformance-checked; md5 priorities make the sample — and therefore
    * the estimate — bit-identical in every engine and under any
    * partitioning.
    *
    * Median semantics are the LOWER median (the ⌈n/2⌉-th smallest value),
    * picked by rank rather than interpolation: both engines agree on it
    * exactly, where `percentile`/`quantile_cont` interpolation formulas
    * may differ in the last bit. The exact group median is computed
    * alongside (full group sort — the correctness comparison, not the
    * scale path) so the output doubles as the sketch's error report.
    *
    * Scale shape: the sample selection is one rank window per group
    * bounded at k rows downstream; the production single-pass variant is
    * a k-row `TypedImperativeAggregate` buffer, same as KMV.
    */
  def hashSampleQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                          idCol: String, k: Int): DataFrame = {
    val sample = bottomKSample(df, groupCols, Nil, valueCol, idCol, k)
    quantileReport(df, sample, groupCols, valueCol, idCol)
  }

  /** [[hashSampleQuantiles]] answered from PERSISTED per-day sketches —
    * the sample-sketch lifecycle sibling of the HLL daily rollup: each
    * (group, day) stores its k smallest-priority rows (64 rows of id,
    * value, priority), and the month's sample is the k smallest of the
    * UNION of daily sketches. Bottom-k-by-hash merge is EXACTLY
    * transparent — any row in the month's true bottom-k is a fortiori in
    * its own day's bottom-k, so the union always contains the true
    * bottom-k — hence this shares the direct query's oracle verbatim and
    * must hash-equal it. At 100 TB the rollup reads |groups|×|days|×k
    * sketch rows, never the corpus (the corpus pass here is only the
    * exact-median error report both variants carry).
    */
  def hashSampleQuantilesFromDaily(df: DataFrame, groupCols: Seq[String],
      valueCol: String, idCol: String, dayCol: org.apache.spark.sql.Column,
      k: Int, scratchDir: String): DataFrame = {
    bottomKSample(df.withColumn("_day", dayCol), groupCols, Seq("_day"),
        valueCol, idCol, k)
      .write.mode("overwrite").parquet(scratchDir)
    val daily = df.sparkSession.read.parquet(scratchDir)
    val gcols = groupCols.map(col)
    val wPri = Window.partitionBy(gcols: _*).orderBy(col("_pri"), col(idCol))
    val merged = daily.withColumn("_r2", row_number().over(wPri))
      .filter(col("_r2") <= k)
    quantileReport(df, merged, groupCols, valueCol, idCol)
  }

  /** k smallest-by-(md5 priority, id) rows per (groupCols ++ extraKeys). */
  private def bottomKSample(df: DataFrame, groupCols: Seq[String],
      extraKeys: Seq[String], valueCol: String, idCol: String, k: Int): DataFrame = {
    val keyCols = (groupCols ++ extraKeys).map(col)
    val pri = expr(
      s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 15), 16, 10) AS BIGINT)")
    val wPri = Window.partitionBy(keyCols: _*).orderBy(col("_pri"), col(idCol))
    df.select((keyCols :+ col(idCol) :+ col(valueCol)): _*)
      .withColumn("_pri", pri)
      .withColumn("_r", row_number().over(wPri))
      .filter(col("_r") <= k)
      .drop("_r")
  }

  /** Shared tail of the two sample-quantile variants: per-group lower
    * median of the sample next to the exact corpus median (error report).
    */
  private def quantileReport(df: DataFrame, sample: DataFrame,
      groupCols: Seq[String], valueCol: String, idCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    def lowerMedian(in: DataFrame, out: String): DataFrame = {
      val wVal = Window.partitionBy(gcols: _*)
        .orderBy(col(valueCol), col(idCol))
      val wAll = Window.partitionBy(gcols: _*)
      in.withColumn("_vr", row_number().over(wVal))
        .withColumn("_n", count(lit(1)).over(wAll))
        .filter(col("_vr") === ceil(col("_n") / 2.0))
        .select((gcols :+ col(valueCol).as(out) :+ col("_n")): _*)
    }
    lowerMedian(sample, "est_median")
      .withColumnRenamed("_n", "n_sample")
      .join(lowerMedian(df, "exact_median").withColumnRenamed("_n", "n_total"),
        groupCols)
      .select((gcols :+ col("n_total") :+ col("n_sample") :+
        col("est_median") :+ col("exact_median")): _*)
  }

  /** Measured Bloom false-positive census — the TUNING TABLE for the
    * semi-join reduction ([[graft.ops.BloomJoin]]): for geometry (m, k)
    * and md5-derived positions (the oracle-shared hash primitive — the
    * engine path uses codegen'd xxhash64, same math, different hash), a
    * DISJOINT probe set measures the real false-pass rate, alongside the
    * fill factor that predicts it. A saturated filter shows up as
    * fpr→10000 here BEFORE someone ships it as a join prune. Everything
    * is exact integers; no estimate formulas.
    *
    * Scale shape: k-explode of both key sets, one distinct on set
    * positions (≤ m rows), one anti-join, four 1-row aggregates
    * cross-joined — no driver-side bitset, no collect.
    */
  def bloomFprCensus(build: DataFrame, probe: DataFrame, keyCol: String,
                     mBits: Int = 65536, k: Int = 3): DataFrame = {
    def positions(df: DataFrame) = df
      .select(col(keyCol).cast("long").as("key")).distinct()
      .withColumn("j", explode(expr(s"sequence(0, ${k - 1})")))
      .withColumn("pos", expr(
        s"CAST(conv(substring(md5(concat(CAST(key AS STRING), '_', CAST(j AS STRING))), 1, 12), 16, 10) AS BIGINT) % $mBits"))
    val setPos = positions(build).select(col("pos")).distinct()
    val probeKeys = probe.select(col(keyCol).cast("long").as("key")).distinct()
    val missing = positions(probe)
      .join(setPos, Seq("pos"), "left_anti")
      .select(col("key")).distinct()
      .agg(count(lit(1)).as("n_rejected"))
    build.select(col(keyCol).cast("long").as("key")).distinct()
      .agg(count(lit(1)).as("n_build"))
      .crossJoin(probeKeys.agg(count(lit(1)).as("n_probe")))
      .crossJoin(setPos.agg(count(lit(1)).as("n_bits_set")))
      .crossJoin(missing)
      .select(col("n_build"), col("n_probe"), col("n_bits_set"),
        (col("n_probe") - col("n_rejected")).as("n_false_pass"),
        expr("(n_probe - n_rejected) * 10000 div n_probe").as("fpr_per_10k"),
        expr(s"n_bits_set * 10000 div $mBits").as("fill_per_10k"))
  }

  /** JOIN-SIZE estimation from a key sample — the cardinality question a
    * cost-based planner asks before picking a join strategy:
    * |A ⋈ B| = Σ_v cntA(v)·cntB(v), estimated from the bottom-k keys by
    * hash (the KMV sample is uniform over DISTINCT keys, so the sampled
    * multiplicity products scale by D̂/k where D̂ is the KMV distinct
    * estimate — end-biased sampling, Estan & Naughton's shape). All
    * corpus-scale work is ONE conditional-count aggregate per key; the
    * estimator then runs on the ≤k-row sample. The exact join size rides
    * alongside as the accuracy report (it is what the planner would have
    * had to compute — the thing the sketch exists to avoid).
    */
  def joinSizeEstimate(df: DataFrame, groupCol: String, valueCol: String,
                       groupA: String, groupB: String, k: Int): DataFrame = {
    val cnts = df.filter(col(groupCol).isin(groupA, groupB))
      .groupBy(col(valueCol).as("_v"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("_ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("_cb"))
      .withColumn("_h", expr(
        "CAST(conv(substring(md5(CAST(_v AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .localCheckpoint(true) // referenced by the sample AND the exact sum
    // bottom-k via TakeOrderedAndProject (distributed top-k) — never an
    // unpartitioned window over the corpus-scale key set; the kth-min
    // hash is simply the max of a FULL sample
    val sample = cnts.orderBy(col("_h")).limit(k)
      .agg(
        count(lit(1)).as("sample_size"),
        max(col("_h")).as("_maxh"),
        sum(col("_ca") * col("_cb")).as("sample_join_rows"))
      .withColumn("kth_min_hash",
        when(col("sample_size") === k, col("_maxh")))
      .drop("_maxh")
    val exact = cnts.agg(
      count(lit(1)).as("exact_distinct_keys"),
      sum(col("_ca") * col("_cb")).as("exact_join_size"))
    sample.crossJoin(exact)
      .withColumn("est_distinct_keys",
        kmvEstimate(col("kth_min_hash"), col("sample_size"), k))
      .withColumn("est_join_size",
        (col("sample_join_rows").cast("double") / col("sample_size").cast("double"))
          * col("est_distinct_keys"))
      .select(col("sample_size"), col("sample_join_rows"),
        col("est_distinct_keys"), col("est_join_size"),
        col("exact_distinct_keys"), col("exact_join_size"))
  }
}
