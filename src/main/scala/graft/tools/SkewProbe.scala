package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the q_skew_aqe plan-guard: prints the AQE-final plan
  * under forced skew thresholds and the shuffle partition sizes. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.Sessions.local("4",
      extra = Map(
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
                "spark.sql.files.maxPartitionBytes" -> "65536"))
    spark.sparkContext.setLogLevel("INFO")
    org.apache.log4j.Logger.getLogger(
      "org.apache.spark.sql.execution.adaptive").setLevel(org.apache.log4j.Level.DEBUG)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val big = spark.range(0, 200000, 1, 20)
      .select(when(col("id") % 2 === 0, 0L).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"))
    val dim = spark.range(0, 1000)
      .select(col("id").as("k2"), (col("id") * 7).as("w"))
    val df = big.hint("shuffle_merge").join(dim, col("k") === col("k2"))
      .agg(sum(col("v") * col("w")).as("s"), count(lit(1)).as("n"))
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    println("=== FINAL PLAN ===")
    println(p.toString)
    spark.stop()
  }
}
