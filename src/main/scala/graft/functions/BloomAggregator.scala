package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass mergeable Bloom filter — the semi-join reduction sketch: a
  * fixed m-bit bitset summarizes the build side's join keys, broadcasts in
  * kilobytes, and prunes the probe side BEFORE its shuffle. No false
  * negatives ever (every build key passes the probe), tunable false
  * positives (the later exact join removes them) — so the rewrite
  * `probe.where(mightContain(key)).join(build)` is result-identical to the
  * plain join while shuffling only the surviving fraction. This is the
  * hand-rollable form of Spark's own runtime bloom-filter rewrite, as an
  * explicit reusable operator.
  *
  * Unlike the oracle-reproduced sketches (KMV/CMS/HLL on the shared md5
  * fold), the bloom bitset never appears in a query RESULT — the oracle of
  * a bloom-pruned join is the plain join. That frees the hash to be
  * `xxhash64`, Spark's codegen'd native hash: build and probe evaluate the
  * IDENTICAL engine expression ([[graft.ops.BloomJoin.positionsSql]]), so
  * agreement is by construction and the per-row probe costs no string
  * building or md5.
  *
  * The aggregator input is therefore a bit POSITION (already hashed by the
  * engine); `reduce` sets the bit, `merge` is bitwise OR — partial
  * aggregation builds partition-local filters map-side and ORs them, the
  * mergeability that distributes the build over any number of executors.
  */
object BloomAggregator {

  final class Bloom(mBits: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")

    override def zero: Array[Long] = new Array[Long](mBits / 64)

    override def reduce(buf: Array[Long], pos: Long): Array[Long] = {
      val p = pos.toInt
      buf(p >>> 6) |= (1L << (p & 63))
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) |= b2(i); i += 1 }
      b1
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def bloom(mBits: Int): Bloom = new Bloom(mBits)
}
