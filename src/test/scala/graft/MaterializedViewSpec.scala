package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Aggregate

import graft.plans.MaterializedViews

/** Materialized-view substitution contract: exact canonical-plan matches
  * are served from the materialization (no Aggregate survives), anything
  * else is untouched, multiple sites in one plan get independent ids, and
  * clearing the registry restores the original plan.
  */
class MaterializedViewSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def hasAgg(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[Aggregate])

  test("exact-match substitution: fires, stays transparent, scoped, reversible") {
    import spark.implicits._
    MaterializedViews.clear()
    val p = graft.stages.TempDirs.scratch("graft_mvspec_")
    Seq((1, "a", 10), (2, "b", 20), (3, "a", 30)).toDF("k", "g", "v")
      .write.mode("overwrite").parquet(p)
    def ask = spark.read.parquet(p).groupBy($"g").agg(sum($"v").as("s"))

    MaterializedViews.register(spark, "t", ask)
    val served = ask
    assert(!hasAgg(served), "registered ask must be served from the MV")
    assert(served.orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 40L), ("b", 20L)))

    // a DIFFERENT aggregate over the same base is not a match
    val other = spark.read.parquet(p).groupBy($"g").agg(count(lit(1)).as("n"))
    assert(hasAgg(other), "non-matching aggregate must be left alone")

    // two substitution sites in one plan: both served, ids independent
    val both = ask.unionByName(ask)
    assert(!hasAgg(both))
    assert(both.count() == 4)

    // clearing the registry restores the original aggregation plan
    MaterializedViews.clear()
    assert(hasAgg(ask), "cleared registry must stop substituting")
  }
}
