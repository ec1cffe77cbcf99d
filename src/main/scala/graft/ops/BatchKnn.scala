package graft.ops

import graft.functions.{TopKBuffer, VectorKernels, VectorOps}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical batch-kNN kernel: scores a broadcast query block against the
  * corpus in a tight per-partition matrix loop with bounded top-k heaps,
  * then merges the (partition x query) candidates with the TopKAgg.
  *
  * Why mapPartitions here (the documented last resort): batch scoring is a
  * dense m x n x d multiply — per-(row x query) Catalyst row materialization
  * (crossJoin) costs more than the arithmetic itself. This is the same
  * escape hatch MLlib uses for its BLAS-bound inner loops. Everything
  * around the loop stays declarative: the corpus is a DataFrame, the merge
  * is an aggregate, the result is a DataFrame.
  *
  * Scale: each task reads only its corpus partition; queries are broadcast
  * (m x d bytes); emitted rows are m x k per partition — shuffle volume is
  * independent of corpus size. Scores are bitwise identical to the
  * declarative cosine_int8 path (same exact-integer dots, same double ops).
  */
object BatchKnn {

  /** corpus: (vec_id long, q binary); queries: (qid, quantized vector).
    * Returns (qid, vec_id, score, rn) with rn in [1, k], deterministic
    * (score DESC, vec_id ASC) order. */
  def searchInt8(corpus: DataFrame, queries: Seq[(Long, Array[Byte])], k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val qb = spark.sparkContext.broadcast(queries.toArray)
    val candRdd = corpus.select(col("vec_id").cast("long"), col("q")).rdd
      .mapPartitions { it =>
        val qs = qb.value
        val qNorms = qs.map(q => VectorKernels.normSqInt8(q._2))
        val bufs = Array.fill(qs.length)(new TopKBuffer(k))
        it.foreach { r =>
          val id = r.getLong(0)
          val v = r.getAs[Array[Byte]](1)
          val na = VectorKernels.normSqInt8(v)
          var qi = 0
          while (qi < qs.length) {
            val dot = VectorKernels.dotInt8(v, qs(qi)._2)
            bufs(qi).insert(VectorKernels.cosineFromParts(dot, na, qNorms(qi)), id)
            qi += 1
          }
        }
        bufs.iterator.zipWithIndex.flatMap { case (b, qi) =>
          (0 until b.size).iterator.map(j => Row(qs(qi)._1, b.ids(j), b.scores(j)))
        }
      }
    val cand = spark.createDataFrame(candRdd, StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))))
    cand.groupBy(col("qid"))
      .agg(VectorOps.topK(col("score"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("qid"), col("t.vec_id").as("vec_id"),
        col("t.score").as("score"), (col("i") + 1).cast("long").as("rn"))
  }
}
