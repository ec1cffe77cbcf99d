package graft.store

import graft.functions.{TopKBuffer, VectorKernels}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One partition's worth of quantized vectors, packed contiguously —
  * the distributed analog of the reference's dense int8 matrix
  * (pythonvectordb.py:225): ids positional, data row-major n x dim. */
final case class VectorBlock(ids: Array[Long], data: Array[Byte], dim: Int) {
  def n: Int = ids.length
}

/** In-memory serving index for batch kNN: corpus packed into per-partition
  * int8 blocks and persisted; a search is ONE job — each task streams its
  * block through a tight dot-product loop keeping a bounded top-k heap per
  * query, and the driver merges parts x k candidates per query.
  *
  * Scale: blocks partition horizontally (any number of executors); queries
  * broadcast (m x dim bytes); per-search traffic = parts x m x k triples.
  * Scores are bitwise identical to the declarative cosine_int8 path (exact
  * integer dots + the same double expression).
  */
final class QuantizedIndex private (
    val blocks: RDD[VectorBlock],
    val dim: Int) extends Serializable {

  def count: Long = blocks.map(_.n.toLong).sum().toLong

  /** Batch search: returns (qid -> top-k (vec_id, score) desc). */
  def search(queries: Array[(Long, Array[Byte])], k: Int): Map[Long, Seq[(Long, Double)]] = {
    val sc = blocks.sparkContext
    val qb = sc.broadcast(queries)
    val partial: Array[(Int, TopKBuffer)] = blocks.flatMap { blk =>
      val qs = qb.value
      val d = blk.dim
      val data = blk.data
      val ids = blk.ids
      // corpus row norms once per block pass
      val rowNorms = new Array[Long](blk.n)
      var r = 0
      while (r < blk.n) {
        var s = 0L; var j = r * d; val end = j + d
        while (j < end) { val x = data(j).toLong; s += x * x; j += 1 }
        rowNorms(r) = s; r += 1
      }
      qs.iterator.zipWithIndex.map { case ((_, q), qi) =>
        val nq = VectorKernels.normSqInt8(q)
        val buf = new TopKBuffer(k)
        var row = 0
        while (row < blk.n) {
          var dot = 0L
          var j = row * d
          var i = 0
          while (i < d) { dot += data(j).toLong * q(i).toLong; j += 1; i += 1 }
          buf.insert(VectorKernels.cosineFromParts(dot, rowNorms(row), nq), ids(row))
          row += 1
        }
        (qi, buf)
      }
    }.collect()
    qb.destroy() // release the broadcast block (a serving loop would leak otherwise)
    // driver merge: parts x k rows per query
    val merged = Array.fill(queries.length) { new TopKBuffer(k) }
    partial.foreach { case (qi, buf) => merged(qi).mergeFrom(buf) }
    queries.indices.map { qi =>
      val b = merged(qi)
      queries(qi)._1 -> (0 until b.size).map(j => (b.ids(j), b.scores(j)))
    }.toMap
  }

  def persist(): this.type = { blocks.persist(StorageLevel.MEMORY_ONLY); this }
  def unpersist(): this.type = { blocks.unpersist(); this }
}

object QuantizedIndex {

  /** Build from a DataFrame with (vec_id: long, embedding: array<float>):
    * quantize + pack per partition. */
  def build(df: DataFrame, dim: Int, numBlocks: Int): QuantizedIndex = {
    val rows = df
      .repartition(numBlocks)
      .select(col("vec_id").cast("long"), col("embedding"))
      .rdd
    val blocks = rows.mapPartitions { it =>
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      it.foreach { r =>
        ids += r.getLong(0)
        val emb = r.getSeq[Float](1).toArray
        chunks += VectorKernels.quantize(emb)
      }
      if (ids.isEmpty) Iterator.empty
      else {
        val data = new Array[Byte](ids.length * dim)
        var i = 0
        while (i < chunks.length) {
          System.arraycopy(chunks(i), 0, data, i * dim, dim); i += 1
        }
        Iterator.single(VectorBlock(ids.toArray, data, dim))
      }
    }
    new QuantizedIndex(blocks, dim)
  }
}
