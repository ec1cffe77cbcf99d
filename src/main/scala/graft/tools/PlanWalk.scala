package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Shared AQE-plan traversal for the measurement tools (ShuffleAudit,
  * ScaleProbe): flattens across query-stage / reused-exchange wrappers,
  * whose materialized subtrees are NOT in `children`. A new AQE wrapper
  * type only needs handling here, once. */
object PlanWalk {

  def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val wrapped: Seq[SparkPlan] = p match {
      case q: QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Nil
    }
    p +: (p.children ++ p.subqueries ++ wrapped).flatMap(collectAll)
  }

  /** (node count, summed dataSize bytes) over the distinct plan nodes
    * matching `sel` — the measured bytes that moved, not an estimate. */
  def countAndBytes(p: SparkPlan)(sel: SparkPlan => Boolean): (Int, Long) = {
    val nodes = collectAll(p).distinct.filter(sel)
    (nodes.size, nodes.flatMap(_.metrics.get("dataSize").map(_.value)).sum)
  }
}
