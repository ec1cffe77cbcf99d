package graft.tools

import graft.{Sessions, Tables}
import graft.functions.VectorOps
import graft.ops.MLQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prints IVF (q_ivf_kmeans) recall@3 vs the exact brute-force top-3 at a
  * given SF dir — the measurement behind MLQueries.IvfRecallFloor.
  * Usage: runMain graft.tools.IvfProbe /root/testdata/sf0.01 */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = Sessions.fromEnv("32", appName = "graft-ivf-probe")
    val ivf = MLQueries.ivfTop3(s, d).select(col("qid"), col("vec_id"))
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    val exact = q.join(emb.select(col("vec_id"), col("embedding")),
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.cosineFloat(col("qe"), col("embedding")).as("score"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("vec_id"))
    val nhit = exact.join(ivf, Seq("qid", "vec_id"), "left_semi").count()
    val n = exact.count()
    println(s"IVF_RECALL dir=$d nhit=$nhit n=$n recall=${nhit.toDouble / n}")
    s.stop()
  }
}
