package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Defensive optimizer rule: strip a broadcast hint whose side is far too
  * large to broadcast.
  *
  * An explicit `broadcast()` hint is honored by Spark REGARDLESS of
  * `autoBroadcastJoinThreshold` — the planner will happily collect a
  * fact-scale table onto the driver and OOM it. The engine's broadcast
  * policy (ARCHITECTURE.md) says hints belong only on structurally
  * dim-sized sides; this rule enforces the policy mechanically at plan
  * time: any join-side hint whose estimated size exceeds
  * `margin × autoBroadcastJoinThreshold` is removed, letting Catalyst fall
  * back to a shuffle join. The margin (default 4×) leaves room for
  * deliberate slightly-above-threshold broadcasts while catching the
  * orders-of-magnitude mistakes that kill clusters. Disabled when
  * auto-broadcast is disabled (threshold ≤ 0) — that configuration
  * signals the user wants full manual control.
  *
  * Runs in the user-provided optimizer batch, i.e. after
  * `EliminateResolvedHint` has folded hints into [[JoinHint]]s — so the
  * rule rewrites join hints, the form the planner actually consumes.
  */
case class DehintOversizedBroadcasts(session: SparkSession) extends Rule[LogicalPlan] {

  private val margin = 4L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = session.sessionState.conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan
    val cap = BigInt(threshold) * margin
    // Plans with no real statistics — DSv2 sources that don't implement
    // SupportsReportStatistics, LogicalRDD — report the
    // spark.sql.defaultSizeInBytes sentinel (Long.MaxValue) at the LEAF.
    // Estimates built on such a leaf are meaningless at every altitude:
    // aggregates/joins keep it >= the sentinel, but a Project SCALES it
    // DOWN (childSize × outputRow/childRow), so an arbitrary huge-but-
    // below-sentinel number can surface for a side that is actually tiny.
    // Therefore the reliability test is on the side's leaves, not on its
    // top-level estimate: any sentinel leaf ⇒ the estimate is unknown ⇒
    // honor the user's deliberate hint rather than silently stripping it
    // session-wide (driver ADVICE.md finding). The test is EQUALITY with
    // the sentinel, not >=: stats-less leaves report exactly
    // defaultSizeInBytes, while a deployment that lowers that conf can
    // have real (known) leaf sizes far above it — those must stay
    // eligible for stripping or the OOM guard silently disables itself.
    val unknown = BigInt(session.sessionState.conf.defaultSizeInBytes)
    def statsUnknown(p: LogicalPlan): Boolean =
      p.collectLeaves().exists(_.stats.sizeInBytes == unknown)

    def strip(side: Option[HintInfo], sidePlan: LogicalPlan): Option[HintInfo] =
      side match {
        case Some(h) if h.strategy.contains(BROADCAST) &&
            sidePlan.stats.sizeInBytes > cap =>
          if (statsUnknown(sidePlan)) {
            logWarning("graft: keeping broadcast hint on a side with unknown " +
              "statistics (defaultSizeInBytes sentinel) — cannot prove it oversized")
            side
          } else {
            logWarning(s"graft: stripping broadcast hint — side estimated at " +
              s"${sidePlan.stats.sizeInBytes} bytes exceeds $cap " +
              s"($margin x autoBroadcastJoinThreshold); falling back to a shuffle join")
            val stripped = h.copy(strategy = None)
            if (stripped == HintInfo()) None else Some(stripped)
          }
        case other => other
      }

    plan.transformUp {
      case j @ Join(left, right, _, _, hint) =>
        val newHint = JoinHint(strip(hint.leftHint, left), strip(hint.rightHint, right))
        if (newHint != hint) j.copy(hint = newHint) else j
    }
  }
}
