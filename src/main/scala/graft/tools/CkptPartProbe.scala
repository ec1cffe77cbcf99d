package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Dev probe: does an eager localCheckpoint capture the hash partitioning
  * of a preceding repartition(col), and does a subsequent equi-join on
  * that key then skip re-exchanging the checkpointed side? Prints the
  * LogicalRDD's captured partitioning and the join's physical plan. */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", appName = "ckpt-part-probe", logLevel = "ERROR")
    import spark.implicits._
    val base = spark.range(0, 100000).select(col("id").as("src"),
      (col("id") % 97).as("dst"))
    val ck = base.repartition(col("src")).persist()
    ck.count()
    println(s"PROBE cached partitioning: " +
      ck.queryExecution.executedPlan.outputPartitioning)
    val other = spark.range(0, 5000).select(col("id").as("src"),
      lit(1L).as("lbl"))
    // disable auto-broadcast so the shuffle requirement is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = ck.join(other, "src")
    j.write.format("noop").mode("overwrite").save()
    println(j.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
