package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual registered queries in isolation.
  * Usage: runMain graft.QTime <sfDir> <reps> <name> [<name> ...]
  * Prints per-rep seconds for each query (noop-sink materialization,
  * same as Bench) so variance is visible without a full sweep.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSet
    val spark = Sessions.fromEnv("32", appName = "graft-qtime")
    Tables.lineitem(spark, sfDir).count() // warm up

    SparkEntry.registry.filter(q => names.contains(q.name)).foreach { q =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME ${q.name} ${ts.map(t => f"$t%.2f").mkString(" ")} min=${ts.min}%.2f")
    }
    spark.stop()
  }
}
