package graft.tools

import graft.{Sessions, Tables}
import graft.functions.VectorOps
import graft.ops.PqQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures OPQ (q_opq_recall) against plain PQ at a given SF dir:
  * recall@3 vs the exact brute-force top-3 for both, plus mean squared
  * quantization error at EQUAL Lloyd's budget — the measurements behind
  * PqQueries.OpqRecallFloor / OpqErrTol, and a rotation-orthogonality
  * check (max |R R^T - I|).
  * Usage: runMain graft.tools.OpqProbe /root/testdata/sf0.01 */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = Sessions.fromEnv("32", appName = "graft-opq-probe")
    val t0 = System.nanoTime()
    val (rot, opqCb) = PqQueries.trainOpq(s, d)

    // orthogonality of the learned rotation
    val dim = math.sqrt(rot.length).toInt
    var maxDev = 0.0
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        var acc = 0.0
        var t = 0
        while (t < dim) { acc += rot(i * dim + t) * rot(j * dim + t); t += 1 }
        val dev = math.abs(acc - (if (i == j) 1.0 else 0.0))
        if (dev > maxDev) maxDev = dev
        j += 1
      }
      i += 1
    }

    val emb = Tables.embeddings(s, d)
    val pqCb = PqQueries.trainCodebookOn(emb, PqQueries.OpqTotalIters, None)

    def recallOf(approx: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
      val exact = q.join(emb.select(col("vec_id"), col("embedding")),
          col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          VectorOps.cosineFloat(col("qe"), col("embedding")).as("score"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("qid"), col("vec_id"))
      (exact.join(approx, Seq("qid", "vec_id"), "left_semi").count(), exact.count())
    }

    val (opqHit, n) = recallOf(
      PqQueries.pqTop3WithCodebook(s, d, opqCb, Some(rot))
        .select(col("qid"), col("vec_id")))
    val (pqHit, _) = recallOf(
      PqQueries.pqTop3WithCodebook(s, d, pqCb, None)
        .select(col("qid"), col("vec_id")))

    val pqErr = PqQueries.meanPqError(emb, None, pqCb).head().getDouble(0)
    val opqErr = PqQueries.meanPqError(emb, Some(rot), opqCb).head().getDouble(0)

    // parametric (closed-form, Gaussian-assumption) variant at the same budget
    val (rotP, cbP) = PqQueries.trainOpqParametric(s, d)
    var maxDevP = 0.0
    i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        var acc = 0.0
        var t = 0
        while (t < dim) { acc += rotP(i * dim + t) * rotP(j * dim + t); t += 1 }
        val dev = math.abs(acc - (if (i == j) 1.0 else 0.0))
        if (dev > maxDevP) maxDevP = dev
        j += 1
      }
      i += 1
    }
    val (opqpHit, _) = recallOf(
      PqQueries.pqTop3WithCodebook(s, d, cbP, Some(rotP))
        .select(col("qid"), col("vec_id")))
    val opqpErr = PqQueries.meanPqError(emb, Some(rotP), cbP).head().getDouble(0)

    val sec = (System.nanoTime() - t0) / 1e9
    println(f"OPQ_PROBE dir=$d M=${PqQueries.M} K=${PqQueries.K} " +
      f"iters=${PqQueries.OpqTotalIters} orthoDev=$maxDev%.2e orthoDevP=$maxDevP%.2e " +
      f"pq_recall=${pqHit.toDouble / n}%.3f opq_recall=${opqHit.toDouble / n}%.3f " +
      f"opqp_recall=${opqpHit.toDouble / n}%.3f " +
      f"pq_err=$pqErr%.6f opq_err=$opqErr%.6f opqp_err=$opqpErr%.6f " +
      f"ratio=${opqErr / pqErr}%.4f ratioP=${opqpErr / pqErr}%.4f " +
      f"sec=$sec%.1f")
    s.stop()
  }
}
