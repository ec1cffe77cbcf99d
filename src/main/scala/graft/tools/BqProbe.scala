package graft.tools

import graft.{Sessions, Tables}
import graft.functions.VectorOps
import graft.ops.PqQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prints binary-quantization (q_bq_recall) recall@3 vs the exact
  * brute-force top-3 at a given SF dir — the measurement behind
  * PqQueries.BqRecallFloor.
  * Usage: runMain graft.tools.BqProbe /root/testdata/sf0.01 */
object BqProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = Sessions.fromEnv("32", appName = "graft-bq-probe")
    val t0 = System.nanoTime()
    val bq = PqQueries.bqTop3(s, d).select(col("qid"), col("vec_id"))
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    val exact = q.join(emb.select(col("vec_id"), col("embedding")),
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.cosineFloat(col("qe"), col("embedding")).as("score"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("vec_id"))
    val nhit = exact.join(bq, Seq("qid", "vec_id"), "left_semi").count()
    val n = exact.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"BQ_RECALL dir=$d candK=${PqQueries.CandK} nhit=$nhit n=$n " +
      f"recall=${nhit.toDouble / n}%.3f sec=$sec%.2f")
    s.stop()
  }
}
