package graft

import graft.functions.VectorKernels
import graft.store.QuantizedIndex
import org.apache.spark.sql.functions._

/** The physical batch-kNN paths (packed QuantizedIndex, BatchKnn
  * mapPartitions kernel) must agree bitwise with the declarative
  * cosine_int8 DataFrame path. */
class BatchKnnSpec extends SparkSpec {

  private def declarativeTopK(qid: Long, k: Int): Seq[(Long, Double)] = {
    val emb = Tables.embeddings(spark, sf001)
    val qv = emb.select(col("vec_id"),
      graft.functions.VectorOps.quantizeInt8(col("embedding")).as("q"))
    val q = qv.filter(col("vec_id") === qid).select(col("q").as("q0"))
    qv.crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.functions.VectorOps.cosineInt8(col("q"), col("q0")).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc).limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("QuantizedIndex batch search == declarative search, bitwise") {
    val emb = Tables.embeddings(spark, sf001)
    val index = QuantizedIndex.build(emb, dim = 64, numBlocks = 4).persist()
    val queryVecs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), VectorKernels.quantize(r.getSeq[Float](1).toArray)))
    val got = index.search(queryVecs, k = 10)
    queryVecs.foreach { case (qid, _) =>
      assert(got(qid) == declarativeTopK(qid, 10), s"qid $qid")
    }
    index.unpersist()
  }

  test("BatchKnn DataFrame kernel == declarative search") {
    val emb = Tables.embeddings(spark, sf001)
    val qv = emb.select(col("vec_id"),
      graft.functions.VectorOps.quantizeInt8(col("embedding")).as("q"))
    val queryVecs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), VectorKernels.quantize(r.getSeq[Float](1).toArray)))
      .toSeq
    val got = graft.ops.BatchKnn.searchInt8(qv, queryVecs, k = 10)
      .collect().groupBy(_.getLong(0))
    queryVecs.foreach { case (qid, _) =>
      val rows = got(qid).sortBy(_.getLong(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == declarativeTopK(qid, 10), s"qid $qid")
    }
  }

  test("TopKAgg ties break by ascending id") {
    import spark.implicits._
    val df = Seq((1L, 0.5), (2L, 0.5), (3L, 0.5), (4L, 0.9))
      .toDF("id", "score")
    val top = df.agg(graft.functions.VectorOps.topK(col("score"), col("id"), 3).as("t"))
      .select(posexplode(col("t")).as(Seq("i", "s")))
      .select(col("s.vec_id")).collect().map(_.getLong(0)).toSeq
    assert(top == Seq(4L, 1L, 2L))
  }

  test("LocalIndex replica == distributed index search, bitwise") {
    val emb = Tables.embeddings(spark, sf001)
    val index = QuantizedIndex.build(emb, dim = 64, numBlocks = 4).persist()
    val local = index.toLocal
    assert(local.count == 500)
    val queryVecs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), VectorKernels.quantize(r.getSeq[Float](1).toArray)))
    val dist = index.search(queryVecs, k = 10)
    queryVecs.foreach { case (qid, q) =>
      assert(local.search(q, 10) == dist(qid), s"qid $qid")
    }
    index.unpersist()
  }
}
