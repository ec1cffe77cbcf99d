package graft.tools

import graft.{Sessions, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Prints q_bloom_decontaminate's observed false-positive doc rate at a
  * given SF dir — the measurement behind PipelineQueries.FpDocBound.
  * Usage: runMain graft.tools.BloomProbe /root/testdata/sf0.01 */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = Sessions.fromEnv("32", appName = "graft-bloom-probe")
    val docs = Tables.documents(s, d)
      .withColumn("b", TextOps.md5Prefix60(
        concat(lit("split:"), col("doc_id").cast("string"))) % 100)
      .withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= 8)
    def grams(side: String) = docs
      .filter(if (side == "train") col("b") < 80 else col("b") >= 90)
      .select(col("doc_id").as(s"${side}_doc"),
        explode(array_distinct(transform(sequence(lit(0), size(col("t")) - 8),
          i => concat_ws(" ", (0 until 8).map(o => element_at(col("t"), i + o + 1)): _*))))
          .as("g"))
      .select(col(s"${side}_doc"), TextOps.md5Prefix60(col("g")).as("gh"))
    val test = grams("test").select(col("gh")).distinct()
    val train = grams("train")
    val bloom = test.stat.bloomFilter("gh", math.max(1L, test.count()), 0.0001)
    val flagged = train.filter(TextOps.bloomMightContain(col("gh"), bloom))
      .select("train_doc").distinct().count()
    val truly = train.join(test, "gh").select("train_doc").distinct().count()
    val nTrain = docs.filter(col("b") < 80).count()
    val clean = nTrain - truly
    val fpRate = if (clean == 0) 0.0 else (flagged - truly).toDouble / clean
    println(f"BLOOM dir=$d n_train=$nTrain true=$truly flagged=$flagged " +
      f"fp_doc_rate=$fpRate%.4f")
    s.stop()
  }
}
