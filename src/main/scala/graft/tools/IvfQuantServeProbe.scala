package graft.tools

import graft.functions.VectorKernels

/** Throughput probe of the COMPOSED serving tiers (LocalIvfPqIndex /
  * LocalIvfBqIndex) against flat and IVF-flat on the same clustered
  * corpus — the evidence tool for the r13 candidate-heap fix (the
  * TopKBuffer candidate stage was O(candK) per insert, capping the
  * composed tiers at ~1.2k QPS; the CandidateHeap is O(log candK)).
  *
  *   tools/run_main.sh graft.tools.IvfQuantServeProbe [n] [cells] [nprobe] [candK]
  */
object IvfQuantServeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val cells = args.lift(1).map(_.toInt).getOrElse(if (n > 100000) 128 else 64)
    val nprobe = args.lift(2).map(_.toInt).getOrElse(8)
    val candK = args.lift(3).map(_.toInt).getOrElse(1024)
    val spark = graft.Sessions.local("8", appName = "ivfquant-serve-probe")
    import spark.implicits._
    val dim = 128
    val nCenters = math.max(8, n / 500)
    val rnd = new scala.util.Random(97)
    val centers = Array.fill(nCenters)(Array.fill(dim)(rnd.nextGaussian().toFloat * 3f))
    val vecs = Array.tabulate(n) { i =>
      val c = centers(i % nCenters)
      Array.tabulate(dim)(j => c(j) + rnd.nextGaussian().toFloat * 1.0f)
    }
    val ids = Array.tabulate(n)(_.toLong)
    val embDf = ids.zip(vecs).toSeq.toDF("vec_id", "embedding").repartition(32)
    val flat = graft.store.QuantizedIndex.build(embDf, dim, numBlocks = 32).toLocal
    val queries = (0 until 100).map { _ =>
      val c = centers(rnd.nextInt(nCenters))
      Array.tabulate(dim)(j => c(j) + rnd.nextGaussian().toFloat * 1.0f)
    }.toArray
    val qBytes = queries.map(VectorKernels.quantize)
    val cb = graft.ops.PqQueries.trainCodebookOn(embDf)
    def timed(label: String, build: => Unit): Unit = {
      val t = System.nanoTime(); build
      println(f"$label%-14s build_sec=${(System.nanoTime() - t) / 1e9}%.1f")
    }
    var ivf: graft.store.LocalIvfIndex = null
    var ivfpq: graft.store.LocalIvfPqIndex = null
    var ivfbq: graft.store.LocalIvfBqIndex = null
    timed("ivf", { ivf = graft.store.LocalIvfIndex.train(ids, vecs, cells) })
    timed("ivfpq", { ivfpq = graft.store.LocalIvfPqIndex.train(ids, vecs, cells,
      graft.ops.PqQueries.M, graft.ops.PqQueries.K, cb) })
    timed("ivfbq", { ivfbq = graft.store.LocalIvfBqIndex.train(ids, vecs, cells) })
    val truth = qBytes.map(q => flat.search(q, 10).map(_._1).toSet)
    def recall(got: Array[Set[Long]]): Double =
      got.zip(truth).map { case (g, t) => (g & t).size / 10.0 }.sum / truth.length
    println(f"recall10: ivf=${recall(qBytes.map(q => ivf.search(q, 10, nprobe).map(_._1).toSet))}%.3f " +
      f"ivfpq=${recall(queries.map(q => ivfpq.search(q, 10, nprobe, candK).map(_._1).toSet))}%.3f " +
      f"ivfbq=${recall(queries.map(q => ivfbq.search(q, 10, nprobe, candK).map(_._1).toSet))}%.3f")
    (0 until 10).foreach { i =>
      flat.search(qBytes(i), 10); ivf.search(qBytes(i), 10, nprobe)
      ivfpq.search(queries(i), 10, nprobe, candK)
      ivfbq.search(queries(i), 10, nprobe, candK)
    }
    for (_ <- 0 until 3) {
      def qps(body: => Unit): Double = {
        val t = System.nanoTime(); body; 100.0 / ((System.nanoTime() - t) / 1e9)
      }
      val f = qps(qBytes.foreach(q => flat.search(q, 10)))
      val i1 = qps(qBytes.foreach(q => ivf.search(q, 10, nprobe)))
      val p = qps(queries.foreach(q => ivfpq.search(q, 10, nprobe, candK)))
      val b = qps(queries.foreach(q => ivfbq.search(q, 10, nprobe, candK)))
      println(f"flat_qps=$f%.0f ivf_qps=$i1%.0f ivfpq_qps=$p%.0f ivfbq_qps=$b%.0f")
    }
    spark.stop()
  }
}
