package graft.tools

import graft.{Sessions, SparkEntry, Tables}
import graft.ops.MLQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: measured recall@3 of the MLlib BucketedRandomProjectionLSH
  * neighbors vs the exact euclidean top-3, per fixture SF — used to
  * freeze BrpRecallFloor with margin before the q_mllib_brp oracle
  * states recall_ok = 1. */
object BrpProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", appName = "brp-probe", logLevel = "ERROR")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val brp = MLQueries.brpTop3(spark, d)
      val emb = Tables.embeddings(spark, d)
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val dist = {
        val diff2 = zip_with(col("qe"), col("embedding"),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double")))
        sqrt(aggregate(diff2, lit(0.0), (acc, v) => acc + v))
      }
      val sc = q.join(emb.select(col("vec_id"), col("embedding")),
          col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), dist.as("dist"))
      val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("vec_id"))
      val exact = sc.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("qid"), col("vec_id"))
      val nhit = exact.join(brp.select(col("qid"), col("vec_id")),
        Seq("qid", "vec_id"), "left_semi").count()
      println(f"$d -> recall@3 = ${nhit / 15.0}%.3f ($nhit/15)")
    }
    spark.stop()
  }
}
