package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass mergeable KMV distinct sketch — the production form of
  * `ops.Sketch.kmvDistinct` (whose rank-window formulation is the
  * oracle-transparent reference). The buffer is the k smallest DISTINCT
  * hashes seen, kept sorted; partial aggregation bounds every shuffle
  * buffer at k longs per (group × map partition), so the sketch costs
  * O(k) memory and one pass regardless of group size — no window sort of
  * the whole group. `merge` unions two summaries and keeps the k
  * smallest: the mergeability that makes the sketch distributable.
  *
  * The estimate reproduces the window form's arithmetic bit-for-bit:
  * fewer than k distinct values → the exact count; otherwise
  * (k-1) / (kth_min / 2^60) with the same long→double conversions. One
  * caveat: this buffer dedups HASHES while the window form dedups VALUES,
  * so the two diverge iff two distinct values collide in the 60-bit hash
  * AND that hash ranks among a group's k smallest (~k·n/2^61 per group —
  * negligible, and shared with every md5-prefix consumer here).
  */
object KmvAggregator {

  final case class KmvOut(kth_min_hash: Option[Long], estimate: Double)

  private val HashSpace = math.pow(2.0, 60)

  final class Kmv(k: Int) extends Aggregator[Long, Seq[Long], KmvOut] {
    override def zero: Seq[Long] = Vector.empty

    override def reduce(buf: Seq[Long], h: Long): Seq[Long] = insert(buf, h)

    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
      b2.foldLeft(b1)(insert)

    override def finish(buf: Seq[Long]): KmvOut =
      if (buf.size < k) KmvOut(None, buf.size.toDouble)
      else KmvOut(Some(buf.last), (k - 1).toDouble / (buf.last.toDouble / HashSpace))

    /** sorted-distinct insert, bounded at the k smallest */
    private def insert(buf: Seq[Long], h: Long): Seq[Long] = {
      if (buf.size == k && h >= buf.last) buf
      else {
        val i = buf.search(h)(Ordering.Long) match {
          case scala.collection.Searching.Found(_) => return buf // already present
          case scala.collection.Searching.InsertionPoint(p) => p
        }
        val grown = (buf.take(i) :+ h) ++ buf.drop(i)
        if (grown.size > k) grown.dropRight(1) else grown
      }
    }

    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
  }

  def kmv(k: Int): Kmv = new Kmv(k)
}
