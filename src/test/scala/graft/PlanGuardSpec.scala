package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}

/** Plan-shape regression guards: the scale properties PLANS.md documents,
  * asserted structurally so an edit can't silently reintroduce a corpus
  * shuffle, drop a top-k pushdown, or lose a broadcast. Counts come from
  * the AQE-final executed plan of the inspected DataFrame itself. */
class PlanGuardSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect() // finalize THIS QueryExecution's adaptive plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    // flatten across AQE's query-stage / reused-exchange wrappers, whose
    // materialized subtrees are NOT in `children`
    val wrapped: Seq[SparkPlan] = p match {
      case q: QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Nil
    }
    p +: (p.children ++ p.subqueries ++ wrapped).flatMap(collectAll)
  }

  private def shuffles(p: SparkPlan): Int =
    collectAll(p).count(_.isInstanceOf[ShuffleExchangeLike])
  private def broadcasts(p: SparkPlan): Int =
    collectAll(p).count(_.isInstanceOf[BroadcastExchangeLike])

  test("q_knn: zero shuffles; corpus flows scan->project->top-k") {
    val p = finalPlan(SparkEntry.queries("q_knn")(spark, sf001))
    assert(shuffles(p) == 0, s"corpus side must not shuffle:\n$p")
    assert(broadcasts(p) == 1, "the 1-row query vector broadcasts")
    assert(p.toString.contains("TakeOrderedAndProject"), "top-k pushdown lost")
  }

  test("q_bm25: only the 1-row stats aggregate shuffles") {
    val p = finalPlan(SparkEntry.queries("q_bm25")(spark, sf001))
    assert(shuffles(p) == 1, s"expected only the stats agg exchange:\n$p")
    assert(broadcasts(p) == 1)
    assert(p.toString.contains("TakeOrderedAndProject"))
  }

  test("q_simhash: narrow kernel pipeline, sort-only exchange") {
    val p = finalPlan(SparkEntry.queries("q_simhash")(spark, sf001))
    assert(shuffles(p) <= 1, s"simhash must stay narrow before the sort:\n$p")
    assert(p.toString.contains("simhash32"), "codegen kernel missing from plan")
  }

  test("q5_star: all dimension joins broadcast, no dim-side shuffle blowup") {
    val p = finalPlan(SparkEntry.queries("q5_star")(spark, sf001))
    assert(broadcasts(p) >= 3, s"dims must broadcast:\n${p.toString.take(1500)}")
  }

  test("q_knn_filtered: metadata predicate reaches the parquet scan") {
    val df = SparkEntry.queries("q_knn_filtered")(spark, sf001)
    df.collect()
    val scans = df.queryExecution.executedPlan.toString
    assert(scans.contains("PushedFilters: [") &&
      scans.contains("EqualTo(label,2)"),
      s"filter not pushed:\n${scans.take(1500)}")
  }
}
