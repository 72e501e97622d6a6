package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Operational guardrail for the no-fact-broadcast discipline: when
  * `spark.graft.broadcastGuard.maxBytes` is set (≥ 0), any plan about to
  * execute with a BroadcastExchange whose build side is ESTIMATED above
  * the limit fails fast with a descriptive error — at the driver, before
  * the cluster materializes a multi-gigabyte broadcast and OOMs its
  * executors one task at a time.
  *
  * This is the runtime complement to PlanRegressionSpec's static
  * assertions: the test suite proves the SHIPPED queries never force a
  * fact-sized broadcast; the guard protects a production session against
  * NEW user queries (or stale statistics) re-introducing one. Injected as
  * a query-stage preparation rule, so under AQE it also re-checks the
  * re-optimized plan each time a stage is about to run, where runtime
  * (exact) sizes have replaced estimates.
  *
  * Estimates come from the logical link's statistics; a node with no
  * linked stats is passed through — the guard is best-effort by design,
  * never a correctness gate. Default off (unset / -1).
  */
case class BroadcastGuard(session: SparkSession) extends Rule[SparkPlan] {

  override def apply(plan: SparkPlan): SparkPlan = {
    val maxBytes = session.conf
      .get("spark.graft.broadcastGuard.maxBytes", "-1").toLong
    if (maxBytes >= 0) {
      plan.foreach {
        case b: BroadcastExchangeExec =>
          b.child.logicalLink.map(_.stats.sizeInBytes).foreach { est =>
            if (est > maxBytes) {
              throw new IllegalStateException(
                s"graft broadcast guard: build side estimated at $est bytes " +
                  s"exceeds spark.graft.broadcastGuard.maxBytes=$maxBytes; " +
                  "a fact-proportional broadcast OOMs executors at scale — " +
                  "use a shuffle join (remove the broadcast hint / refresh " +
                  "statistics), or raise the guard if the side is genuinely " +
                  s"dimension-sized. Offending subplan:\n${b.child.treeString}")
            }
          }
        case _ => ()
      }
    }
    plan
  }
}
