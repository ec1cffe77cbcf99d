package graft.tools

import graft.{SparkEntry, Sessions}

/** Print the formatted physical plan of one registry query (local iteration
  * aid — not part of the driver contract). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.fromEnv("8", appName = "graft-explain")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    df.collect()
    // execute first so AQE finalizes the real plan
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
