package graft.tools

import graft.Sessions
import graft.functions.VectorOps
import graft.ops.PqQueries
import graft.store.LocalPqIndex

/** Replicates Bench's PQ serving block standalone: 50k random dim-128
  * vectors, trained codebook, LocalPqIndex ADC scan — prints QPS.
  * Usage: runMain graft.tools.PqServeProbe */
object PqServeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.fromEnv("32", appName = "graft-pq-serve-probe")
    import spark.implicits._
    val dim = 128
    val rnd = new scala.util.Random(42)
    val embDf = (0 until 50000).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val pqM = PqQueries.M
    val pqK = PqQueries.K
    val cb = PqQueries.trainCodebookOn(embDf)
    val codeRows = embDf.select(embDf("vec_id"),
      VectorOps.pqEncode(embDf("embedding"), cb, pqM, pqK).as("c")).collect()
    val ids = new Array[Long](codeRows.length)
    val codes = new Array[Byte](codeRows.length * pqM)
    var i = 0
    while (i < codeRows.length) {
      ids(i) = codeRows(i).getLong(0)
      System.arraycopy(codeRows(i).getAs[Array[Byte]](1), 0, codes, i * pqM, pqM)
      i += 1
    }
    val pq = new LocalPqIndex(ids, codes, pqM, pqK, cb)
    val qrnd = new scala.util.Random(7)
    val qs = (0 until 100).map(_ => Array.fill(dim)(qrnd.nextGaussian().toFloat)).toArray
    (0 until 10).foreach(j => pq.search(qs(j), 10))
    val best = (0 until 5).map { _ =>
      val t = System.nanoTime()
      qs.foreach(q => pq.search(q, 10))
      (System.nanoTime() - t) / 1e9
    }.min
    println(f"PQ_SERVE qps=${100.0 / best}%.0f best_sec=$best%.4f")
    spark.stop()
  }
}
