package graft.tools

import graft.{Sessions, SparkEntry, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Dev tool: measured GROWTH of the scale-critical queries across the three
  * driver fixtures (sf0.001 → sf0.01 → sf0.1 — two real 10x corpus steps,
  * 100x end to end). For each query and SF it records wall time and actual
  * shuffle bytes (dataSize SQLMetrics off the AQE-final plan), then prints
  * the 10x-step growth ratios. This is the direct evidence for the "would
  * it survive 100x?" question: a candidate-generation stage whose shuffle
  * grows ~linearly (ratio ≈ 10 per step) scales to the cluster; a ratio
  * trending toward 100 means quadratic pair volume and a redesign.
  *
  * Wall time at small SFs is fixed-overhead dominated (query compile,
  * task dispatch floor ~0.1-0.3s) — shuffle bytes are the honest scaling
  * signal, wall ratios are reported for completeness. NOTE the documents
  * table is 500 rows at BOTH sf0.001 and sf0.01 (FIXTURES.md), so
  * document-based queries have ONE real 10x step.
  *
  * Usage: runMain graft.tools.ScaleProbe [query ...]
  * (defaults to the dedup/ANN/text candidate-generation family)
  */
object ScaleProbe {

  private val DefaultQueries = Seq(
    "q_dedup_exact", "q_simhash", "q_minhash_lsh", "q_ngram_jaccard",
    "q_neardup_thresh", "q_substring_dedup", "q_bm25", "q_inverted_index",
    "q_knn", "q_ivf_search", "q_events_sessions", "q_asof_join",
    "q_hopping_windows")

  private val Sfs = Seq(
    "/root/testdata/sf0.001" -> 0.001,
    "/root/testdata/sf0.01" -> 0.01,
    "/root/testdata/sf0.1" -> 0.1)

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else DefaultQueries
    val spark = Sessions.fromEnv("32", appName = "graft-scale-probe")
    try {
      Sfs.foreach { case (dir, _) => Tables.documents(spark, dir).count() } // warm

      println(f"${"query"}%-20s ${"sf"}%6s ${"wall_s"}%8s ${"shufMB"}%9s ${"wall x/step"}%12s ${"shuf x/step"}%12s")
      names.foreach { name =>
        SparkEntry.registry.find(_.name == name) match {
          case None => System.err.println(s"[scale] unknown query $name")
          case Some(q) =>
            var prev: Option[(Double, Double)] = None
            Sfs.foreach { case (dir, sf) =>
              try {
                // rep 1 warms (codegen/compile), rep 2 is the measurement
                val wall = (1 to 2).map { _ =>
                  val t0 = System.nanoTime()
                  q.fn(spark, dir).write.format("noop").mode("overwrite").save()
                  (System.nanoTime() - t0) / 1e9
                }.min
                val df = q.fn(spark, dir)
                df.collect()
                val shufMB = PlanWalk.countAndBytes(df.queryExecution.executedPlan)(
                  _.isInstanceOf[ShuffleExchangeLike])._2 / 1048576.0
                spark.catalog.clearCache()
                System.gc()
                val (wr, sr) = prev match {
                  case Some((pw, ps)) =>
                    (f"${wall / pw}%.1f", if (ps > 0.001) f"${shufMB / ps}%.1f" else "n/a")
                  case None => ("-", "-")
                }
                println(f"$name%-20s $sf%6s $wall%8.2f $shufMB%9.3f $wr%12s $sr%12s")
                prev = Some((wall, shufMB))
              } catch { case e: Throwable =>
                System.err.println(s"[scale] $name @ sf$sf: $e")
                prev = None
              }
            }
        }
      }
    } finally spark.stop()
  }
}
