package graft.tools

import graft.{Sessions, SparkEntry, Tables}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Dev tool: measured shuffle inventory per registry query. Executes each
  * query and reads the `dataSize` SQLMetric off every ShuffleExchange /
  * BroadcastExchange in the AQE-final plan — the actual bytes that moved,
  * not an estimate. This is the feedback loop for the "minimize shuffles"
  * design rule: a query whose shuffle volume scales with the corpus where
  * its output doesn't is the thing to fix.
  *
  * Usage: runMain graft.tools.ShuffleAudit [sfDir] [query ...]
  * Prints one line per query: shuffle exchange count + bytes, broadcast
  * count + bytes, sorted by shuffle bytes descending.
  */
object ShuffleAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args.drop(1).toSet
    val spark = Sessions.fromEnv("32", appName = "graft-shuffle-audit")
    try {
      Tables.lineitem(spark, sfDir).count() // warm up

      val rows = SparkEntry.registry
        .filter(q => names.isEmpty || names.contains(q.name))
        .flatMap { q =>
          try {
            val df = q.fn(spark, sfDir)
            df.collect() // drive THIS QueryExecution so its metrics populate
            val plan = df.queryExecution.executedPlan
            val (nShuf, shufBytes) =
              PlanWalk.countAndBytes(plan)(_.isInstanceOf[ShuffleExchangeLike])
            val (nBc, bcBytes) =
              PlanWalk.countAndBytes(plan)(_.isInstanceOf[BroadcastExchangeLike])
            spark.catalog.clearCache()
            Some((q.name, nShuf, shufBytes, nBc, bcBytes))
          } catch {
            case e: Throwable =>
              System.err.println(s"[audit] ${q.name}: $e"); None
          }
        }
        .sortBy(-_._3)

      println(f"${"query"}%-26s ${"shuf#"}%5s ${"shuffleMB"}%10s ${"bc#"}%4s ${"bcastMB"}%8s")
      rows.foreach { case (name, nShuf, sb, nBc, bb) =>
        println(f"$name%-26s $nShuf%5d ${sb / 1048576.0}%10.2f $nBc%4d ${bb / 1048576.0}%8.2f")
      }
      val totalMB = rows.map(_._3).sum / 1048576.0
      println(f"TOTAL shuffle: $totalMB%.1f MB across ${rows.map(_._2).sum} exchanges in ${rows.size} queries")
    } finally spark.stop()
  }
}
