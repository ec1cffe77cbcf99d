package graft.store

import graft.functions.{SimdSupport, TopKBuffer, VectorKernels}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One partition's worth of quantized vectors, packed contiguously —
  * the distributed analog of the reference's dense int8 matrix
  * (pythonvectordb.py:225): ids positional, data row-major n x dim.
  *
  * `data` is the canonical int8 payload (1 B/component on the wire and in
  * any cache serialization); `dataShort`/`rowNorms` are per-JVM lazy
  * derivations for the SIMD scan kernel, computed once per cached block. */
final case class VectorBlock(ids: Array[Long], data: Array[Byte], dim: Int) {
  def n: Int = ids.length

  @transient lazy val dataShort: Array[Short] = {
    val out = new Array[Short](data.length)
    var i = 0
    while (i < data.length) { out(i) = data(i).toShort; i += 1 }
    out
  }

  @transient lazy val rowNorms: Array[Long] = {
    val norms = new Array[Long](n)
    var r = 0
    while (r < n) {
      var s = 0L; var j = r * dim; val end = j + dim
      while (j < end) { val x = data(j).toLong; s += x * x; j += 1 }
      norms(r) = s; r += 1
    }
    norms
  }
}

/** In-memory serving index for batch kNN: corpus packed into per-partition
  * int8 blocks and persisted; a search is ONE job — each task streams its
  * block through the SIMD dot-product kernel (SimdKernels) keeping a
  * bounded top-k heap per query, and the driver merges parts x k candidates
  * per query.
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
    val partial: Array[Array[TopKBuffer]] = blocks.map { blk =>
      val qs = qb.value
      val data = blk.dataShort
      val norms = blk.rowNorms
      val bufs = new Array[TopKBuffer](qs.length)
      var qi = 0
      while (qi < qs.length) {
        val q = qs(qi)._2
        val qShort = new Array[Short](q.length)
        var i = 0
        while (i < q.length) { qShort(i) = q(i).toShort; i += 1 }
        val buf = new TopKBuffer(k)
        SimdSupport.scan(data, norms, blk.ids, 0, blk.n, blk.dim,
          qShort, VectorKernels.normSqInt8(q), buf)
        bufs(qi) = buf
        qi += 1
      }
      bufs
    }.collect()
    // Release executor-side broadcast blocks WITHOUT blocking: destroy()
    // waits on a driver RPC round-trip per call, which throttled the batch
    // serving loop ~3x (BENCH_r04 ref_batch_qps_50k 1162->338). Async
    // unpersist keeps the loop hot; the ContextCleaner reclaims the
    // driver-side block once the Broadcast object is GC'd.
    qb.unpersist(blocking = false)
    // driver merge: parts x k rows per query
    val merged = Array.fill(queries.length) { new TopKBuffer(k) }
    partial.foreach { bufs =>
      var qi = 0
      while (qi < bufs.length) { merged(qi).mergeFrom(bufs(qi)); qi += 1 }
    }
    queries.indices.map { qi =>
      val b = merged(qi)
      queries(qi)._1 -> (0 until b.size).map(j => (b.ids(j), b.scores(j)))
    }.toMap
  }

  def persist(): this.type = { blocks.persist(StorageLevel.MEMORY_ONLY); this }
  def unpersist(): this.type = { blocks.unpersist(); this }

  /** Estimated resident bytes: ids (8B) + int8 payload (dim B) per vector —
    * the same `count x dim` payload accounting the reference reports
    * (pythonvectordb.py:520). NOTE: computed with a Spark job over the
    * blocks (a count-style aggregate); when the blocks aren't persisted
    * this rescans the source. */
  def estimatedBytes: Long = blocks.map(b => b.n.toLong * (8L + dim)).sum().toLong

  /** Driver-local replica for the low-latency serving tier: collects the
    * packed blocks once (count x (dim+8) bytes) and serves searches fully
    * in-process — the faithful analog of the reference's single-node prange
    * kernel (pythonvectordb.py:25-67). Use for corpora that fit one node;
    * the distributed path handles the rest.
    *
    * Guarded: refuses corpora whose DRIVER-PEAK footprint exceeds
    * `maxLocalBytes` (default 4 GiB) so a caller cannot OOM the driver by
    * pointing this at a cluster-sized corpus — misuse fails fast with the
    * distributed `search` named as the alternative. The peak is the
    * MATERIALIZED replica, not the packed payload: while building, the
    * collected byte blocks (dim+8 B/vector) coexist with the repacked
    * short[] data (2*dim), ids (8) and rowNorms (8) — ~3x the payload
    * estimate; the guard accounts for all of it. Computing the estimate
    * runs one Spark job over the blocks. */
  def toLocal: LocalIndex = toLocal(QuantizedIndex.DefaultMaxLocalBytes)

  def toLocal(maxLocalBytes: Long): LocalIndex = {
    val n = blocks.map(_.n.toLong).sum().toLong
    // peak during LocalIndex construction: collected blocks (dim+8)
    // + short[] data (2*dim) + ids (8) + rowNorms (8) per vector
    val peak = n * (3L * dim + 24L)
    require(peak <= maxLocalBytes,
      s"toLocal refused: materializing this corpus needs ~$peak bytes of " +
        s"driver heap at peak (> limit $maxLocalBytes). Use the " +
        "distributed QuantizedIndex.search, or raise the limit explicitly " +
        "via toLocal(maxLocalBytes).")
    new LocalIndex(blocks.collect(), dim)
  }
}

/** In-process (driver-side) index: same scores as the distributed path
  * (bitwise), no job scheduling per query. The corpus is repacked into ONE
  * contiguous short[] and scanned by a fixed thread pool over row ranges —
  * SIMD inner loop, ~microseconds per 50k x 128 search. */
final class LocalIndex(blocks: Array[VectorBlock], val dim: Int) {

  val count: Int = blocks.map(_.n).sum

  private val data = new Array[Short](count * dim)
  private val ids = new Array[Long](count)
  private val rowNorms = new Array[Long](count)
  locally {
    var off = 0
    blocks.foreach { blk =>
      var r = 0
      while (r < blk.n) {
        val srcBase = r * dim
        val dstBase = (off + r) * dim
        var j = 0
        while (j < dim) { data(dstBase + j) = blk.data(srcBase + j).toShort; j += 1 }
        ids(off + r) = blk.ids(r)
        var s = 0L
        var i = srcBase
        val end = srcBase + dim
        while (i < end) { val x = blk.data(i).toLong; s += x * x; i += 1 }
        rowNorms(off + r) = s
        r += 1
      }
      off += blk.n
    }
  }

  // worker gang; a chunk is >= MinChunk rows so small corpora don't pay
  // dispatch overhead
  private val MinChunk = 2048
  private val maxThreads =
    math.max(1, math.min(Runtime.getRuntime.availableProcessors(), 16))
  private val gangSize = math.max(1, math.min(maxThreads, count / MinChunk))
  private val gang = if (gangSize > 1) new ScanGang(gangSize) else null

  // Concurrency model (NOT the reference's RLock, pythonvectordb.py:362,
  // which serializes every search): a lone caller takes the whole scan
  // gang for minimum latency; when callers overlap, each extra caller
  // scans the corpus on its OWN thread instead of queueing, so aggregate
  // throughput scales with cores. The corpus arrays are immutable after
  // construction, so unsynchronized reads are safe; TopKBuffer's total
  // (score desc, id asc) order makes chunked-merge and sequential-scan
  // results bitwise identical (asserted by SimdSpec).
  private val gangLock = new java.util.concurrent.locks.ReentrantLock()

  /** Thread-parallel SIMD scan, deterministic merge. */
  def search(q: Array[Byte], k: Int): Seq[(Long, Double)] = {
    require(q.length == dim, s"query dimension ${q.length} != $dim")
    val nq = VectorKernels.normSqInt8(q)
    val qShort = new Array[Short](dim)
    var i = 0
    while (i < dim) { qShort(i) = q(i).toShort; i += 1 }
    val merged = new TopKBuffer(k)
    if (gang != null && gangLock.tryLock()) {
      try {
        val per = (count + gangSize - 1) / gangSize
        val bufs = new Array[TopKBuffer](gangSize)
        gang.run { c =>
          val lo = c * per
          val hi = math.min(count, lo + per)
          val buf = new TopKBuffer(k)
          SimdSupport.scan(data, rowNorms, ids, lo, hi, dim, qShort, nq, buf)
          bufs(c) = buf
        }
        bufs.foreach(merged.mergeFrom)
      } finally gangLock.unlock()
    } else {
      // gang busy (concurrent burst) or corpus too small for fan-out:
      // full scan on the calling thread
      SimdSupport.scan(data, rowNorms, ids, 0, count, dim, qShort, nq, merged)
    }
    (0 until merged.size).map(j => (merged.ids(j), merged.scores(j)))
  }
}

/** Fixed gang of daemon scan workers with spin-then-park waiting: during a
  * query burst (the serving loop) workers stay spinning and dispatch costs
  * ~1us; when idle past the spin budget they park and cost nothing. This is
  * what makes sequential single-query latency competitive with the
  * reference's in-process prange kernel — a conventional executor pays an
  * unpark wake-up per worker per query (~0.5ms for a gang of 12+).
  */
private[store] final class ScanGang(val n: Int) {
  import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
  import java.util.concurrent.locks.LockSupport

  private val epoch = new AtomicLong(0)
  private val done = new AtomicInteger(0)
  // first failure of the current job; rethrown on the query thread by run()
  private val failure =
    new java.util.concurrent.atomic.AtomicReference[Throwable](null)
  @volatile private var job: Int => Unit = null
  // ~100k onSpinWait iterations ~ a few hundred microseconds of hot wait
  private val SpinBudget = 100000

  private final class Worker(id: Int) extends Thread(s"scan-gang-$id") {
    @volatile var parked = false
    setDaemon(true)
    override def run(): Unit = {
      var seen = 0L
      while (true) {
        var spins = 0
        while (epoch.get() == seen) {
          Thread.onSpinWait()
          spins += 1
          if (spins >= SpinBudget) {
            parked = true
            // re-check after publishing parked (run() checks parked AFTER
            // bumping epoch, so either we see the new epoch or it unparks us)
            if (epoch.get() == seen) LockSupport.park()
            parked = false
            spins = 0
          }
        }
        seen = epoch.get()
        // A throwing job must NOT propagate out of run(): it would kill
        // this daemon thread and every later gang.run would hang waiting
        // for done == n. Stash the first failure; run() rethrows it on
        // the query thread after the barrier.
        try job(id)
        catch { case t: Throwable => failure.compareAndSet(null, t) }
        finally done.incrementAndGet()
      }
    }
  }

  private val workers = Array.tabulate(n)(new Worker(_))
  workers.foreach(_.start())

  /** Run job(0..n-1) on the gang; returns when all are done. Callers must
    * serialize runs: LocalIndex.search only enters here under gangLock
    * (tryLock winners); losers scan on their own thread instead. Any new
    * call path must hold that lock — job/done/epoch are shared state. */
  def run(f: Int => Unit): Unit = {
    job = f
    done.set(0)
    epoch.incrementAndGet()
    var w = 0
    while (w < n) {
      if (workers(w).parked) LockSupport.unpark(workers(w))
      w += 1
    }
    while (done.get() < n) Thread.onSpinWait()
    job = null
    val t = failure.getAndSet(null)
    if (t != null) throw t // worker crash surfaces here, workers stay alive
  }
}

object QuantizedIndex {

  /** Default ceiling for toLocal's driver-side collect: 4 GiB of packed
    * payload — generous for a single-node serving replica, far below any
    * corpus that belongs on the distributed path. */
  val DefaultMaxLocalBytes: Long = 4L << 30

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
