package graft.tools

import graft.{Sessions, Tables}
import graft.ops.TextQueries
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** Dev tool: MLlib MinHashLSH coverage of the exact jaccard>=0.8 truth
  * set per numHashTables, per fixture SF — freezes the table count that
  * keeps q_mllib_minhash's all_true_found invariant non-brittle. */
object MinhashCoverageProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("16", appName = "mh-probe", logLevel = "ERROR")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = TextQueries.tokenized(spark, d)
        .select(col("doc_id"), TextQueries.shingleArray(col("t")).as("toks"))
      val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
        .setBinary(true).setNumFeatures(1 << 18)
        .transform(docs).select(col("doc_id"), col("tf")).persist()
      tf.count()
      val shh = TextQueries.tokenized(spark, d)
        .select(col("doc_id"), explode(TextQueries.shingleArray(col("t"))).as("sh"))
        .select(col("doc_id"), graft.functions.TextOps.md5Prefix60(col("sh")).as("shh"))
      val sizes = shh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val truePairs = shh.select(col("doc_id").as("doc_a"), col("shh"))
        .join(shh.select(col("doc_id").as("doc_b"), col("shh")), "shh")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .filter(col("inter").cast("double") / (col("na") + col("nb") - col("inter")) >= lit(0.8))
        .select(col("doc_a"), col("doc_b")).persist()
      val nTrue = truePairs.count()
      for (nt <- Seq(2, 3, 4, 5)) {
        val mh = new MinHashLSH().setInputCol("tf").setOutputCol("sig")
          .setNumHashTables(nt).setSeed(42L)
        val model = mh.fit(tf)
        val found = model.approxSimilarityJoin(tf, tf, 0.2, "dist")
          .select(col("datasetA.doc_id").as("doc_a"), col("datasetB.doc_id").as("doc_b"))
          .filter(col("doc_a") < col("doc_b"))
        val missed = truePairs.join(found, Seq("doc_a", "doc_b"), "left_anti").count()
        println(s"PROBE $d nTables=$nt truePairs=$nTrue missed=$missed")
      }
      tf.unpersist(); truePairs.unpersist()
    }
    spark.stop()
  }
}
