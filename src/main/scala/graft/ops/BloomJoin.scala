package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomAggregator

/** Bloom-filter semi-join reduction (see [[graft.functions.BloomAggregator]]
  * for the sketch contract).
  *
  * At 100 TB the shape is: build side aggregates to an m-bit bitset (one
  * tiny row), the bitset broadcasts, and the probe side filters with a
  * per-row codegen'd expression — the fact table's shuffle carries only
  * rows whose key MIGHT join, at the cost of zero additional exchanges
  * (the build agg is the only extra job, over the — by assumption much
  * smaller — build side). False positives survive the prune and are
  * removed by the exact join that follows; false negatives are impossible,
  * which is what makes the rewrite result-transparent.
  */
object BloomJoin {

  /** The k salted bit positions of a key, as a SQL array expression. BOTH
    * sides evaluate this identical expression (build explodes it into the
    * bitset, probe tests it), so hash agreement is by construction —
    * `xxhash64` is Spark's native codegen'd hash, no strings in the hot
    * path. `keySql` is a SQL expression for the key column.
    */
  def positionsSql(keySql: String, mBits: Int, kHashes: Int): String =
    s"transform(sequence(0, ${kHashes - 1}), i -> pmod(xxhash64(i, ($keySql)), $mBits))"

  /** Probe-side filter: keep rows of `probe` whose `probeKey` might be in
    * `build`'s `buildKey` set.
    */
  def prune(probe: DataFrame, probeKey: String, build: DataFrame,
            buildKey: String, mBits: Int = 1 << 16, kHashes: Int = 4): DataFrame = {
    import build.sparkSession.implicits._
    val bits = build
      .select(explode(expr(positionsSql(buildKey, mBits, kHashes))).as("p"))
      .as[Long]
      .select(BloomAggregator.bloom(mBits).toColumn)
      .toDF("_bloom_bits")
    probe
      .crossJoin(broadcast(bits))
      .filter(mightContain(probeKey, "_bloom_bits", mBits, kHashes))
      .drop("_bloom_bits")
  }

  /** The per-row membership test: every one of the k bit positions must be
    * set in the broadcast bitset column.
    */
  def mightContain(keySql: String, bitsCol: String, mBits: Int, kHashes: Int): Column =
    expr(
      s"""forall(${positionsSql(keySql, mBits, kHashes)},
         |  p -> ((shiftright(element_at($bitsCol, CAST(p div 64 AS INT) + 1),
         |                    CAST(p % 64 AS INT)) & 1L) = 1L))""".stripMargin)
}
