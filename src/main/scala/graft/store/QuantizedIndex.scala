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

  /** Estimated resident bytes: ids (8B) + int8 payload (dim B) per vector —
    * the same `count x dim` payload accounting the reference reports
    * (pythonvectordb.py:520). */
  def estimatedBytes: Long = blocks.map(b => b.n.toLong * (8L + dim)).sum().toLong

  /** Driver-local replica for the low-latency serving tier: collects the
    * packed blocks once (count x (dim+8) bytes) and serves searches fully
    * in-process with a thread-parallel scan — the faithful analog of the
    * reference's single-node prange kernel (pythonvectordb.py:25-67). Use
    * for corpora that fit one node; the distributed path handles the rest. */
  def toLocal: LocalIndex = new LocalIndex(blocks.collect(), dim)
}

/** In-process (driver-side) index: same data layout and bitwise-identical
  * scores as the distributed path, no job scheduling per query. */
final class LocalIndex(blocks: Array[VectorBlock], val dim: Int) {

  private val rowNorms: Array[Array[Long]] = blocks.map { blk =>
    val norms = new Array[Long](blk.n)
    var r = 0
    while (r < blk.n) {
      var s = 0L; var j = r * blk.dim; val end = j + blk.dim
      while (j < end) { val x = blk.data(j).toLong; s += x * x; j += 1 }
      norms(r) = s; r += 1
    }
    norms
  }

  def count: Long = blocks.map(_.n.toLong).sum

  /** Thread-parallel scan (one task per block), deterministic merge. */
  def search(q: Array[Byte], k: Int): Seq[(Long, Double)] = {
    require(q.length == dim, s"query dimension ${q.length} != $dim")
    val nq = VectorKernels.normSqInt8(q)
    val futures = blocks.indices.map { bi =>
      java.util.concurrent.CompletableFuture.supplyAsync { () =>
        val blk = blocks(bi)
        val buf = new TopKBuffer(k)
        val data = blk.data
        val d = blk.dim
        val d4 = d - (d % 4)
        var row = 0
        while (row < blk.n) {
          // int accumulation (dim*127^2 < 2^31) with 4x unroll — measurably
          // faster than the scalar long loop on the JVM
          var dot = 0
          val base = row * d
          var i = 0
          while (i < d4) {
            val j = base + i
            dot += data(j) * q(i) + data(j + 1) * q(i + 1) +
              data(j + 2) * q(i + 2) + data(j + 3) * q(i + 3)
            i += 4
          }
          while (i < d) { dot += data(base + i) * q(i); i += 1 }
          buf.insert(VectorKernels.cosineFromParts(dot.toLong, rowNorms(bi)(row), nq), blk.ids(row))
          row += 1
        }
        buf
      }
    }
    val merged = new TopKBuffer(k)
    futures.foreach(f => merged.mergeFrom(f.join()))
    (0 until merged.size).map(j => (merged.ids(j), merged.scores(j)))
  }
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
