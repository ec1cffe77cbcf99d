package graft.tools

import graft.Sessions
import graft.functions.TextOps
import graft.ops.PipelineQueries
import org.apache.spark.sql.functions._

/** Prints q_bloom_decontaminate's observed false-positive doc rate at a
  * given SF dir — the measurement behind PipelineQueries.FpDocBound.
  * Reuses the query's OWN decontDocs/gramHashes pipeline so the probe
  * measures exactly what the oracle gates (a drifted copy here would
  * silently invalidate the stated FP rates).
  * Usage: runMain graft.tools.BloomProbe /root/testdata/sf0.01 [fpp] */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val fpp = if (args.length > 1) args(1).toDouble else 0.0001
    val s = Sessions.fromEnv("32", appName = "graft-bloom-probe")
    val docs = PipelineQueries.decontDocs(s, d)
    val test = PipelineQueries.gramHashes(docs, "test")
      .select(col("gh")).distinct().localCheckpoint(true)
    val train = PipelineQueries.gramHashes(docs, "train").localCheckpoint(true)
    val bloom = test.stat.bloomFilter("gh", math.max(1L, test.count()), fpp)
    val flagged = train.filter(TextOps.bloomMightContain(col("gh"), bloom))
      .select("train_doc").distinct().count()
    val truly = train.join(test, "gh").select("train_doc").distinct().count()
    val nTrain = docs.filter(col("b") < 80).count()
    val clean = nTrain - truly
    val fpRate = if (clean == 0) 0.0 else (flagged - truly).toDouble / clean
    println(f"BLOOM dir=$d fpp=$fpp n_train=$nTrain true=$truly " +
      f"flagged=$flagged fp_doc_rate=$fpRate%.4f")
    s.stop()
  }
}
