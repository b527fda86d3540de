package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering — the `OPTIMIZE ZORDER BY` of
  * lakehouse formats, as plain column math.
  *
  * Why it matters at 100 TB: per-file min/max statistics prune scans only
  * when each file's values are TIGHT. Sorting by one column makes that
  * column's ranges tight and every other column's ranges span the whole
  * domain; interleaving the bits of two (or more) columns into a Morton
  * z-value and range-partitioning on it bounds EVERY interleaved
  * dimension's span per file, so predicates on either column skip files.
  *
  * Everything here is deterministic integer math (scale → interleave →
  * fixed-width bucket), zero shuffles until the final census groupBy — on
  * a cluster the bucket column feeds `repartitionByRange(col("z"))` +
  * sorted parquet writes; the census is how the layout's quality is
  * measured (per-bucket bounding boxes).
  */
object Layout {

  /** Scale a column to `[0, 2^bits)` with pure integer arithmetic, as a
    * DIVISION by the cell width `w = (hi - lo) div 2^bits + 1`: unlike the
    * multiply-then-divide form, no intermediate exceeds the column's own
    * span (the multiply form wraps at span * 2^bits — e.g. multi-year
    * microsecond timestamps at bits=16). Domain contract: the SPAN itself
    * (`hi - lo`) must fit in BIGINT; a column straddling more than half
    * the signed-64 domain (e.g. raw signed hashes) fails loudly under
    * ANSI mode in both engines — pre-shift such columns first. Positive
    * BIGINT division truncates identically in both engines.
    */
  private def scaled(v: String, lo: String, hi: String, bits: Int): String =
    s"(($v - $lo) div ((($hi - $lo) div ${1L << bits}L) + 1L))"

  /** Morton interleave of two `bits`-bit integers: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1.
    */
  private def morton(a: String, b: String, bits: Int): String =
    s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) ->
          acc + shiftleft(shiftright($a, i) & 1L, 2 * i)
              + shiftleft(shiftright($b, i) & 1L, 2 * i + 1))"""

  /** Per-row z-values over two BIGINT columns (global min/max broadcast —
    * one tiny stats row, the same shape as IVF centroids), plus the
    * scaled per-dimension coordinates for census/debugging.
    */
  def withZValue(df: DataFrame, colA: String, colB: String, bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 16, "bits per dimension must be in [1, 16]")
    val stats = df.agg(
      min(col(colA)).as("_a_lo"), max(col(colA)).as("_a_hi"),
      min(col(colB)).as("_b_lo"), max(col(colB)).as("_b_hi"))
    df.crossJoin(broadcast(stats))
      .withColumn("a_scaled", expr(scaled(colA, "_a_lo", "_a_hi", bits)))
      .withColumn("b_scaled", expr(scaled(colB, "_b_lo", "_b_hi", bits)))
      .withColumn("z", expr(morton("a_scaled", "b_scaled", bits)))
      .drop("_a_lo", "_a_hi", "_b_lo", "_b_hi")
  }

  /** Layout-quality census: fixed-width z-range buckets (a stand-in for
    * the range partitioner's split points — per-row math, no global sort)
    * and each bucket's bounding box in the scaled coordinates. Tight
    * boxes == effective file skipping on BOTH columns.
    */
  def zorderCensus(df: DataFrame, colA: String, colB: String,
                   bits: Int = 8, buckets: Int = 16): DataFrame = {
    val zSpan = 1L << (2 * bits)
    withZValue(df, colA, colB, bits)
      .withColumn("bucket", expr(s"CAST((z * $buckets) div $zSpan AS INT)"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("a_scaled")).as("a_min"), max(col("a_scaled")).as("a_max"),
        min(col("b_scaled")).as("b_min"), max(col("b_scaled")).as("b_max"))
  }

  /** Hilbert xy→d (the Wikipedia iterative form) as a per-row array-fold
    * expression: acc = [x, y, d], one fold step per bit from high to low —
    * quadrant digit (3·rx)⊕ry accumulates into d, then the ry=0 rotation
    * (reflect when rx=1, swap always). Pure integer bit math, so the
    * DuckDB mirror (list_reduce with the [v,0,0] list-accumulator trick)
    * is exact. Hilbert keeps every curve step adjacent in space — unlike
    * Morton's quadrant jumps — so range buckets cut tighter bounding
    * boxes on the same data.
    */
  private[graft] def hilbertExpr(x: String, y: String, bits: Int): String = {
    val n1 = (1L << bits) - 1
    def side = "shiftleft(1L, CAST(i AS INT))"
    s"""aggregate(sequence(${bits - 1}, 0, -1),
       |  array($x, $y, 0L),
       |  (acc, i) -> CASE
       |    WHEN (acc[1] & $side) = 0 AND (acc[0] & $side) = 0 THEN
       |      array(acc[1], acc[0], acc[2])
       |    WHEN (acc[1] & $side) = 0 THEN
       |      array(${n1}L - acc[1], ${n1}L - acc[0],
       |            acc[2] + $side * $side * 3L)
       |    WHEN (acc[0] & $side) = 0 THEN
       |      array(acc[0], acc[1], acc[2] + $side * $side)
       |    ELSE
       |      array(acc[0], acc[1], acc[2] + $side * $side * 2L)
       |  END,
       |  acc -> acc[2])""".stripMargin
  }

  /** [[withZValue]]'s Hilbert sibling: per-row Hilbert index `h` over the
    * same integer-scaled coordinates. */
  def withHilbertValue(df: DataFrame, colA: String, colB: String,
                       bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 16, "bits per dimension must be in [1, 16]")
    val stats = df.agg(
      min(col(colA)).as("_a_lo"), max(col(colA)).as("_a_hi"),
      min(col(colB)).as("_b_lo"), max(col(colB)).as("_b_hi"))
    df.crossJoin(broadcast(stats))
      .withColumn("a_scaled", expr(scaled(colA, "_a_lo", "_a_hi", bits)))
      .withColumn("b_scaled", expr(scaled(colB, "_b_lo", "_b_hi", bits)))
      .withColumn("h", expr(hilbertExpr("a_scaled", "b_scaled", bits)))
      .drop("_a_lo", "_a_hi", "_b_lo", "_b_hi")
  }

  /** [[zorderCensus]]'s Hilbert sibling — same fixed-width range buckets
    * and per-bucket bounding boxes, over the Hilbert index. */
  def hilbertCensus(df: DataFrame, colA: String, colB: String,
                    bits: Int = 8, buckets: Int = 16): DataFrame = {
    val span = 1L << (2 * bits)
    withHilbertValue(df, colA, colB, bits)
      .withColumn("bucket", expr(s"CAST((h * $buckets) div $span AS INT)"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("a_scaled")).as("a_min"), max(col("a_scaled")).as("a_max"),
        min(col("b_scaled")).as("b_min"), max(col("b_scaled")).as("b_max"))
  }
}
