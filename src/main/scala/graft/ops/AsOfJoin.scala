package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the latest right row of
  * the same key with `rightTs <= leftTs` — the time-series lookup Spark has
  * no built-in operator for.
  *
  * Composed from built-ins (preference (a) of the custom-operator ladder):
  * union both sides tagged by origin, one window pass per key ordered by
  * (ts, side) carrying the last non-null right payload forward, keep left
  * rows. Right rows sort BEFORE left rows at equal timestamps, giving exact
  * `<=` semantics (DuckDB's ASOF JOIN contract, which is the oracle).
  *
  * Scale: one shuffle on the key (the window partition), no join explosion —
  * each row is touched once, state in the window frame is a single payload
  * tuple. This beats the naive `left.join(right, ts <= ts).groupBy(max)`
  * rewrite, which materializes every (left, right-before-it) pair.
  */
object AsOfJoin {

  /** @param key          equi-join key columns (both sides)
    * @param leftTs       left timestamp column
    * @param rightTs      right timestamp column
    * @param rightPayload right columns carried to the output (nullable when
    *                     no right row precedes the left row)
    */
  def asOf(left: DataFrame, right: DataFrame, key: Seq[String],
           leftTs: String, rightTs: String, rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => key.contains(c) || c == leftTs).toSeq
    val l = left.select(
      (key.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side")) ++
        leftCols.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      (key.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col): _*)
    // deterministic window order: ties inside the right side break on the
    // first payload column
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy((Seq(col("_ts").asc, col("_side").asc) ++
        rightPayload.headOption.map(c => col(c).asc_nulls_first).toSeq): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_side") === 1)
      .drop("_side")
      .withColumnRenamed("_ts", leftTs)
  }

  /** FORWARD as-of: for every left row, the EARLIEST right row of the same
    * key with `rightTs >= leftTs` — next-touch attribution (the view's
    * next purchase, the alert's next ack). Same union+window composition
    * mirrored in time: the frame looks from the current row FORWARD and
    * carries the first non-null right payload; at equal timestamps left
    * rows sort before right rows so the `>=` tie matches (`first` over a
    * currentRow..following frame then sees the right row). Ties inside
    * the right side break on the first payload column, matching the
    * oracle's `min()` reduction. One key shuffle, no pair explosion —
    * identical scale posture to [[asOf]].
    */
  def asOfForward(left: DataFrame, right: DataFrame, key: Seq[String],
                  leftTs: String, rightTs: String, rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => key.contains(c) || c == leftTs).toSeq
    val l = left.select(
      (key.map(col) :+ col(leftTs).as("_ts") :+ lit(0).as("_side")) ++
        leftCols.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      (key.map(col) :+ col(rightTs).as("_ts") :+ lit(1).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy((Seq(col("_ts").asc, col("_side").asc) ++
        rightPayload.headOption.map(c => col(c).asc_nulls_last).toSeq): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = rightPayload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_side") === 0)
      .drop("_side")
      .withColumnRenamed("_ts", leftTs)
  }
}
