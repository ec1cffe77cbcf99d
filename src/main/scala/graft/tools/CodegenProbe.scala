package graft.tools

import graft.{Sessions, SparkEntry, Tables}
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}

/** Dev tool: whole-stage-codegen coverage per registry query. For each
  * AQE-final plan, classifies every COMPUTE node (exchanges, scans, and
  * the codegen plumbing itself excluded) as inside or outside a
  * WholeStageCodegen span, and aggregates the outside-node types across
  * the registry. The "codegen-friendly" design rule is measurable this
  * way: the outside set should contain only operators Spark cannot
  * codegen (WindowExec, ObjectHashAggregate for TypedImperativeAggregate
  * buffers, streaming state ops) — never a row-level UDF filter/project,
  * which would show up here as a non-codegen Filter/Project.
  *
  * Usage: runMain graft.tools.CodegenProbe [sfDir] [query ...]
  */
object CodegenProbe {

  private def inside(p: SparkPlan, inCodegen: Boolean,
      out: collection.mutable.Map[String, Int]): Unit = {
    val (nowIn, count) = p match {
      case _: WholeStageCodegenExec => (true, false)
      case _: InputAdapter => (false, true) // subtree left the span
      case _ => (inCodegen, true)
    }
    if (count) {
      val name = p.getClass.getSimpleName
      val isPlumbing = name.contains("Exchange") || name.contains("QueryStage") ||
        name.contains("Scan") || name.contains("AdaptiveSparkPlan") ||
        name.contains("ResultQueryStage") || name == "InputAdapter" ||
        name.contains("Subquery") || name.contains("ReusedExchange") ||
        name.contains("ShuffleRead") // AQE coalesced-read wrapper
      if (!nowIn && !isPlumbing)
        out(name) = out.getOrElse(name, 0) + 1
    }
    val kids = p match {
      case w: WholeStageCodegenExec => w.children
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    val childIn = p match {
      case _: WholeStageCodegenExec => true
      case _: InputAdapter => false
      case _ => nowIn
    }
    kids.foreach(inside(_, childIn, out))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = args.drop(1).toSet
    val spark = Sessions.fromEnv("16", appName = "graft-codegen-probe")
    try {
      Tables.lineitem(spark, sfDir).count()
      val totals = collection.mutable.Map.empty[String, Int]
      var fullyCovered = 0
      var n = 0
      SparkEntry.registry
        .filter(q => names.isEmpty || names.contains(q.name))
        .foreach { q =>
          try {
            val df = q.fn(spark, sfDir)
            df.collect()
            val out = collection.mutable.Map.empty[String, Int]
            inside(df.queryExecution.executedPlan, inCodegen = false, out)
            n += 1
            if (out.isEmpty) fullyCovered += 1
            else {
              out.foreach { case (k, v) => totals(k) = totals.getOrElse(k, 0) + v }
              println(s"${q.name}: outside codegen -> " +
                out.toSeq.sortBy(-_._2).map { case (k, v) => s"$k x$v" }.mkString(", "))
            }
            spark.catalog.clearCache()
          } catch { case e: Throwable =>
            System.err.println(s"[codegen] ${q.name}: $e")
          }
        }
      println(s"\n$fullyCovered of $n queries have EVERY compute node inside WholeStageCodegen")
      println("registry-wide outside-codegen node totals:")
      totals.toSeq.sortBy(-_._2).foreach { case (k, v) => println(f"  $k%-36s $v%4d") }
    } finally spark.stop()
  }
}
