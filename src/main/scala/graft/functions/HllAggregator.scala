package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass mergeable HyperLogLog — the constant-memory distinct-count
  * sketch (Flajolet et al. 2007): m = 64 registers, each holding the max
  * leading-zero rank seen in its substream. `merge` is elementwise max —
  * the union law that makes HLL distributable, streamable, and cheaper to
  * ship than KMV's k-item buffer (64 bytes here vs 64 longs).
  *
  * Input is the engine's shared 60-bit md5 hash ([[Md5Hash]]), split as
  * `bucket = h % 64` and `w = h div 64` (54 payload bits):
  * `rho(w) = position of the first 1-bit of w in a fixed 54-bit window`
  * (w = 0 → 55). Every piece is integer arithmetic the DuckDB oracle
  * reproduces verbatim — bucket/rho via `bin()` string search, the
  * register array, and the harmonic sum scaled to an exact BIGINT
  * (`sum_scaled = Σ 2^(55-M_j)`, ≤ 2^61, so Σ 2^-M_j = sum_scaled / 2^55
  * without float accumulation order mattering).
  *
  * The raw HLL estimate alpha·m²/Σ2^-M_j is emitted without the
  * small-range linear-counting correction: the correction's ln() is not
  * bit-reproducible across engines, while the raw form is one double
  * multiply + one divide from exact integers. m = 64 → ±13% relative
  * error; the oracle query carries the exact count alongside.
  */
object HllAggregator {

  val M = 64 // registers; bucket = h % 64
  private val PayloadBits = 54 // 60-bit hash minus 6 bucket bits
  // alpha_64 * m^2 = 0.709 * 4096 (Flajolet's bias constant for m=64)
  private val AlphaM2 = 2904.064

  final case class HllOut(registers: String, sum_scaled: Long, estimate: Double)

  /** rho: 1-based position of the first set bit of w inside a fixed
    * 54-bit window; 55 when w = 0. Equals the oracle's
    * `instr(lpad(bin(w), 54, '0'), '1')` (0 → CASE'd to 55).
    */
  def rho(w: Long): Int =
    if (w == 0L) PayloadBits + 1
    else java.lang.Long.numberOfLeadingZeros(w) - (63 - PayloadBits)

  final class Hll extends Aggregator[Long, Array[Int], HllOut] {

    override def zero: Array[Int] = new Array[Int](M)

    override def reduce(buf: Array[Int], h: Long): Array[Int] = {
      val bucket = (h % M).toInt
      val r = rho(h / M)
      if (r > buf(bucket)) buf(bucket) = r
      buf
    }

    override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
      var i = 0
      while (i < M) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }

    override def finish(buf: Array[Int]): HllOut = {
      var sum = 0L
      var i = 0
      while (i < M) { sum += 1L << (PayloadBits + 1 - buf(i)); i += 1 }
      val est = AlphaM2 * math.pow(2.0, PayloadBits + 1) / sum.toDouble
      HllOut(buf.mkString(","), sum, est)
    }

    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[HllOut] = Encoders.product[HllOut]
  }

  def hll(): Hll = new Hll
}
