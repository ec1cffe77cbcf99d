package graft.tools

import graft.{Sessions, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dev experiment: cost of the HOF codegen fallback on the tokenize stage.
  * The text family tokenizes with `filter(split(text,' '), x -> x != '')` —
  * ArrayFilter/ArrayTransform are CodegenFallback in Spark, so any Project
  * containing them (including ones that also carry our codegen'd kernels
  * like simhash32) drops out of whole-stage codegen into interpreted eval.
  * This probe measures the same simhash computation under three tokenizer
  * formulations at sf0.1 to quantify what the fallback actually costs:
  *   hof    — filter(split(text,' '), ...) (the current formulation)
  *   regex  — split(trim(text), ' +')      (codegen-capable, StringSplit)
  *   remove — array_remove(split(text,' '), '') (codegen-capable set op)
  * All three produce identical token arrays on space-separated text with
  * no leading/trailing runs beyond what trim handles; the probe asserts
  * result equality (sum of simhashes) before timing.
  *
  * Usage: runMain graft.tools.TokenizeProbe [sfDir] [reps]
  */
object TokenizeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.fromEnv("32", appName = "graft-tokenize-probe")
    try {
      val docs = Tables.documents(spark, sfDir).select(col("text"))
      docs.count() // warm

      val variants: Seq[(String, Column)] = Seq(
        "hof" -> filter(split(col("text"), " "), t => t =!= ""),
        "regex" -> split(trim(col("text")), " +"),
        "remove" -> array_remove(split(col("text"), " "), ""))

      // correctness: all three tokenizations must agree on this corpus
      val sums = variants.map { case (name, tok) =>
        val v = docs.select(TextOps.simhash32(tok).as("h"))
          .agg(sum(col("h"))).collect().head.getLong(0)
        name -> v
      }
      require(sums.map(_._2).distinct.size == 1,
        s"tokenizer variants disagree: $sums")
      println(s"all variants agree: simhash checksum ${sums.head._2}")

      variants.foreach { case (name, tok) =>
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          docs.select(TextOps.simhash32(tok).as("h"))
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"TOKENIZE $name%-7s ${ts.map(t => f"$t%.2f").mkString(" ")} min=${ts.min}%.2f")
      }
    } finally spark.stop()
  }
}
