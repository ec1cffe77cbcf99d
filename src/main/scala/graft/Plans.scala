package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for selected queries — the .explain
  * feedback loop for partition/pushdown/codegen tuning (SURVEY.md §7 M3). */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_knn", "q_knn_filtered", "q3_join", "q1_agg", "q_minhash_lsh",
        "q_token_stats", "q_ann_bucket")
    val spark = Sessions.local("8", appName = "graft-plans", logLevel = "ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
