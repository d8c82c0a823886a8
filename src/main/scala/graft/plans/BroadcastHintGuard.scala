package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** §2 row 307 — the 100× broadcast GUARD as an optimizer rule: a
  * forced `broadcast()` hint is an unconditional order AQE cannot
  * undo, so a hint that was correct at sf0.1 becomes a job-killer at
  * 100× (the build side ORs past the executor heap and the job DIES —
  * the round-13 Relational3 defect class, here made structurally
  * impossible instead of merely lint-pinned in PlanSpec).
  *
  * The rule walks optimized Join nodes and STRIPS a broadcast hint
  * whose side's estimated `sizeInBytes` exceeds
  * `autoBroadcastJoinThreshold × spark.graft.broadcastGuard.factor`
  * (default 8; threshold falls back to 10 MB when auto-broadcast is
  * disabled). Stripping is always SAFE, never the reverse: the join
  * still runs — AQE re-plans it with RUNTIME sizes and will broadcast
  * anyway when the side is genuinely small (a 5-row aggregate whose
  * STATIC estimate is scan-sized loses only the hint, not the
  * broadcast) — whereas keeping an oversized hint fails the job
  * outright. Conservative static stats therefore cost at most one
  * shuffle, never correctness.
  *
  * Registered by [[graft.GraftExtensions]] (new sessions) or
  * [[graft.plans.BroadcastHintGuard.install]] (a running session);
  * `spark.graft.broadcastGuard.enabled=false` turns it off. Injected
  * rules run in the user-provided batch AFTER hint resolution folded
  * ResolvedHint into Join.hint, so the Join node is the single place
  * every hinted broadcast must pass through. */
object BroadcastHintGuard extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.broadcastGuard.enabled", "true").toBoolean

  private def capBytes: BigInt = {
    val thr = conf.autoBroadcastJoinThreshold
    val base = if (thr > 0) thr else 10L * 1024 * 1024
    val factor = math.max(1L,
      conf.getConfString("spark.graft.broadcastGuard.factor", "8").toLong)
    BigInt(base) * factor
  }

  private def strip(side: Option[HintInfo], child: LogicalPlan,
                    which: String, cap: BigInt): Option[HintInfo] =
    side match {
      case Some(h) if h.strategy.contains(BROADCAST) &&
          child.stats.sizeInBytes > cap =>
        logWarning(s"broadcastGuard: stripping forced broadcast hint on the " +
          s"$which side (estimated ${child.stats.sizeInBytes} bytes > cap " +
          s"$cap) - letting AQE pick the strategy from runtime sizes")
        val stripped = h.copy(strategy = None)
        if (stripped == HintInfo()) None else Some(stripped)
      case other => other
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(l, r, _, _, hint) =>
        val cap = capBytes
        val nl = strip(hint.leftHint, l, "left", cap)
        val nr = strip(hint.rightHint, r, "right", cap)
        if (nl == hint.leftHint && nr == hint.rightHint) j
        else j.copy(hint = JoinHint(nl, nr))
    }

  /** Install on a RUNNING session (builder extensions only affect
    * sessions created after them). Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!ss.experimental.extraOptimizations.contains(this))
      ss.experimental.extraOptimizations =
        ss.experimental.extraOptimizations :+ this
  }

  /** Remove from a running session (spec hygiene). */
  def uninstall(spark: org.apache.spark.sql.SparkSession): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    ss.experimental.extraOptimizations =
      ss.experimental.extraOptimizations.filterNot(_ eq this)
  }
}
