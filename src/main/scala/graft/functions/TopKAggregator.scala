package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass bounded top-k — the optimized alternative to
  * `row_number().over(Window.partitionBy(q).orderBy(score desc))` for top-k
  * per group (SURVEY.md §7.4).
  *
  * The window plan sorts EVERY candidate row inside each partition of the
  * shuffle; this Aggregator keeps at most k elements per partial buffer, so
  * the shuffle moves ≤ k rows per (group × map partition) and nothing is
  * ever globally sorted — the difference between O(n log n) per group and
  * O(n log k) with k-sized spill at 100 TB candidate sets.
  *
  * Ordering ties break on the smaller id (same contract as the window
  * formulation: `orderBy(score desc, id asc)`), so results are identical.
  */
object TopKAggregator {

  final case class Scored(id: Long, score: Double)

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  final class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = insert(buf, a)

    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      b2.foldLeft(b1)(insert)

    override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

    /** keep the buffer sorted best-first and bounded at k */
    private def insert(buf: Seq[Scored], a: Scored): Seq[Scored] = {
      if (buf.size == k && !better(a, buf.last)) buf
      else {
        val (before, after) = buf.span(better(_, a))
        (before :+ a) ++ after.take(k - before.size - 1)
      }
    }

    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }

  def topK(k: Int): TopK = new TopK(k)
}
