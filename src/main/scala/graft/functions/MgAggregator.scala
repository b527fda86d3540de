package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass mergeable Misra-Gries frequent-items summary — the
  * deterministic heavy-hitters sketch: a bounded map of at most `k`
  * counters whatever the key cardinality. `reduce` of an unseen item with
  * a full buffer cancels one unit of every resident counter (the classic
  * decrement-all step); `merge` sums two summaries and, when over
  * capacity, subtracts the (k+1)-th largest count from every entry and
  * drops non-positives (Agarwal et al.'s mergeable-summaries reduction).
  *
  * The guarantee that makes it usable under Spark's ARBITRARY partial
  * aggregation order: every item with true count > n/(k+1) survives in
  * the final summary no matter how partials were merged. The surviving
  * COUNTS are order-dependent (bounded undercounts), so the engine never
  * emits them — [[finish]] returns only the candidate key set, and the
  * caller re-counts candidates exactly and applies the n/(k+1) threshold,
  * making the operator's OUTPUT deterministic while the sketch merely
  * bounds the candidate set to k items. Same prune-then-verify shape as
  * the banded dedup family: the sketch does the scale work, exact
  * arithmetic does the answer.
  */
object MgAggregator {

  final class Mg(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
      buf.get(x) match {
        case Some(c)              => buf.updated(x, c + 1L)
        case None if buf.size < k => buf.updated(x, 1L)
        case None =>
          // decrement-all: x's single unit cancels against one unit of
          // every resident counter; exhausted counters drop
          buf.iterator.map { case (t, c) => t -> (c - 1L) }
            .filter(_._2 > 0L).toMap
      }

    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val sum = b2.foldLeft(b1) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count: at most k entries exceed
        // it, so the reduced summary is back within capacity
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.iterator.map { case (t, c) => t -> (c - cut) }
          .filter(_._2 > 0L).toMap
      }
    }

    override def finish(buf: Map[String, Long]): Seq[String] = buf.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def mg(k: Int): Mg = new Mg(k)
}
