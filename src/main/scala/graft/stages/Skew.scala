package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §7.4: "documented skew strategy —
  * salting on hot courier keys").
  *
  * A courier/user with millions of deliveries makes one reducer the
  * straggler in any groupBy on that key. AQE's skew-join splitting covers
  * the join case at runtime; for AGGREGATIONS the classic fix is two-phase
  * salted aggregation:
  *
  *   1. add `salt = pmod(hash(stable seed cols), S)` → group by (key, salt):
  *      hot key's rows spread across S reducers, each emitting a partial;
  *   2. re-aggregate partials by key alone (≤ S rows per key).
  *
  * Only ALGEBRAIC aggregates (sum/count/min/max — anything with an
  * associative merge) can be salted this way; avg is re-expressed as
  * sum+count. Results are identical to the direct groupBy because decimal/
  * long merges are order-independent.
  *
  * The salt derives from a deterministic hash of caller-chosen columns, not
  * `rand()` — replays produce identical partials, keeping the whole pipeline
  * replay-idempotent (same guarantee the rest of the engine makes).
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * @param df        input
    * @param keys      group-by keys
    * @param saltFrom  columns whose hash spreads the hot key (e.g. the
    *                  business key of the fact row — unique-ish per row)
    * @param salts     number of salt buckets (≈ executor-core count)
    * @param sums      columns to sum (must be algebraic-mergeable types)
    * @param counts    output name for the row count (None to omit)
    */
  /** Salted shuffle join for a hot-keyed fact × moderate dimension.
    *
    * AQE's skew-join split rebalances PARTITIONS after the shuffle, but a
    * single hot KEY still lands every probe row on one reducer. Salting
    * fixes the key itself: the big side gets `salt = pmod(hash(saltFrom), S)`
    * so a hot key's rows spread across S reducers, and the small side is
    * replicated S× (one copy per salt) so every salted probe row still finds
    * its match. Join keys become (keys..., salt); the replication factor is
    * the classic space/parallelism trade — S ≈ executor-core count.
    *
    * The join is pinned to shuffle-merge (`hint("merge")`): salting only
    * exists for the case where the dimension is too big to broadcast — if a
    * broadcast fits, use a plain join and no salt. Inner joins only (each
    * unmatched replicated row would otherwise surface S times in an outer
    * join). Deterministic salt (same contract as [[saltedAggregate]]):
    * replays produce identical partitioning.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFrom: Seq[Column], salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(hash(saltFrom: _*), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedBig.join(replicated.hint("merge"), keys :+ "_salt").drop("_salt")
  }

  def saltedAggregate(df: DataFrame, keys: Seq[String], saltFrom: Seq[Column],
                      salts: Int, sums: Seq[String],
                      counts: Option[String] = Some("n_rows")): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(saltFrom: _*), lit(salts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(
        count(lit(1)).as("_cnt"),
        sums.map(c => sum(col(c)).as(s"_sum_$c")): _*)
    val phase2Aggs =
      sums.map(c => sum(col(s"_sum_$c")).as(c)) ++
        counts.map(n => sum(col("_cnt")).as(n)).toSeq
    phase1
      .groupBy(keys.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }
}
