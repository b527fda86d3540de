package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass mergeable Count-Min Sketch — the bounded-memory frequency
  * sketch (heavy hitters, point frequency estimates) every large-scale
  * pipeline keeps where an exact per-key count table would not fit: the
  * buffer is a fixed d×w counter matrix regardless of key cardinality,
  * partial aggregation sums matrices map-side, and `merge` is elementwise
  * addition — the mergeability that makes it distributable and
  * streamable.
  *
  * estimate(x) = min over rows i of counter[i][bucket_i(x)]; collisions
  * only ever ADD, so the estimate is a guaranteed overestimate
  * (est ≥ true count), within εn with probability 1-δ for w = e/ε,
  * d = ln(1/δ).
  *
  * Cross-engine contract like every hash here: bucket_i(x) is the 60-bit
  * md5 prefix of "i:x" mod w — exactly
  * `CAST('0x' || substr(md5(i || ':' || x), 1, 15) AS BIGINT) % w` in the
  * DuckDB oracle, so the full counter matrix and every probe are
  * integer-reproducible.
  */
object CmsAggregator {

  /** 60-bit md5-prefix bucket, row-salted (probe-side convenience; the
    * aggregation hot path reuses one digest via the instance field below).
    */
  def bucket(row: Int, x: Long, w: Int): Int =
    (Md5Hash.top60(Md5Hash.newDigest(), s"$row:$x") % w).toInt

  final class Cms(d: Int, w: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    // one digest per deserialized Aggregator instance == per task: reset +
    // reuse beats a provider lookup per row × d
    @transient private lazy val md = Md5Hash.newDigest()

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(buf: Array[Long], x: Long): Array[Long] = {
      var i = 0
      while (i < d) {
        buf(i * w + (Md5Hash.top60(md, s"$i:$x") % w).toInt) += 1
        i += 1
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def cms(d: Int, w: Int): Cms = new Cms(d, w)
}
