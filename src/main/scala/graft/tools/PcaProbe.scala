package graft.tools

import graft.{Sessions, Tables}
import graft.ops.MLQueries
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** Prints the top-PcaK explained-variance-proportion sum at a given SF
  * dir — the measurement behind MLQueries.PcaExplainedFloor.
  * Usage: runMain graft.tools.PcaProbe /root/testdata/sf0.01 */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = Sessions.fromEnv("32", appName = "graft-pca-probe")
    val emb = Tables.embeddings(s, d)
    val model = new org.apache.spark.ml.feature.PCA()
      .setInputCol("fv").setOutputCol("proj").setK(MLQueries.PcaK)
      .fit(emb.select(array_to_vector(col("embedding")).as("fv")))
    val props = model.explainedVariance.toArray
    println(f"PCA dir=$d k=${MLQueries.PcaK} explained_sum=${props.sum}%.4f " +
      f"top=${props.head}%.4f")
    s.stop()
  }
}
