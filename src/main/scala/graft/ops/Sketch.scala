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
    kth.withColumn("estimate",
      when(col("kth_min_hash").isNull, col("exact").cast("double"))  // < k values: exact
        .otherwise(lit((k - 1).toDouble) / (col("kth_min_hash") / lit(HashSpace))))
  }
}
