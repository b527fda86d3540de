package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view substitution — the warehouse accelerator as a
  * Catalyst extension: a registered aggregate's result is parqueted once,
  * and any later query whose AGGREGATE SUBTREE is plan-identical
  * (canonicalized equality, so expression-id and cosmetic differences
  * don't matter) is silently served from the materialization instead of
  * re-scanning the fact table. At 100 TB this is the difference between a
  * dashboard query re-reading the corpus and reading kilobytes.
  *
  * Scope is deliberately EXACT-MATCH: no containment reasoning, no
  * partial rollups — substitution fires only when the optimized subtree
  * equals the registered definition's optimized plan, which makes the
  * rewrite provably result-transparent (same plan ⇒ same result; the
  * oracle checks it anyway). Staleness is the registrar's contract, as
  * with every MV system: re-register after base-table changes.
  *
  * The rule installs via `spark.experimental.extraOptimizations` (runs in
  * the user-provided batch AFTER the main optimizer, so the subtree it
  * compares against is in optimized form) and no-ops in O(1) while the
  * registry is empty.
  */
object MaterializedViews {

  final case class Mv(name: String, path: String,
                      canonical: LogicalPlan, scan: LogicalPlan)

  private val reg = new ConcurrentHashMap[String, Mv]()

  def clear(): Unit = reg.clear()

  def all: Seq[Mv] = {
    import scala.jdk.CollectionConverters._
    reg.values().asScala.toSeq
  }

  /** Materialize `defn` and register it for substitution. The parquet
    * write happens BEFORE registration, so materializing can never be
    * served from (or recurse into) the view being built.
    */
  def register(spark: SparkSession, name: String, defn: DataFrame): Unit = {
    val path = graft.stages.TempDirs.scratch(s"graft_mv_${name}_")
    defn.write.mode("overwrite").parquet(path)
    val canonical = defn.queryExecution.optimizedPlan.canonicalized
    val scan = spark.read.parquet(path).queryExecution.analyzed
    reg.put(name, Mv(name, path, canonical, scan))
    ensureInstalled(spark)
  }

  /** Install the substitution rule into this session (idempotent). */
  def ensureInstalled(spark: SparkSession): Unit = synchronized {
    val present = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[RewriteToMaterializedView])
    if (!present)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RewriteToMaterializedView
  }
}

final class RewriteToMaterializedView extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mvs = MaterializedViews.all
    if (mvs.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        mvs.find(_.canonical == agg.canonicalized) match {
          case Some(mv) =>
            // fresh relation instance per substitution site (two matches in
            // one plan must not share expression ids), projected back onto
            // the replaced subtree's output ids so parents resolve unchanged
            val fresh = mv.scan.transformUp {
              case m: MultiInstanceRelation with LogicalPlan => m.newInstance()
            }
            Project(agg.output.zip(fresh.output).map { case (o, n) =>
              Alias(n, o.name)(exprId = o.exprId) }, fresh)
          case None => agg
        }
    }
  }
}
