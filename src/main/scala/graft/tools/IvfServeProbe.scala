package graft.tools

import graft.functions.VectorKernels

/** Quick throughput probe of the IVF-pruned serving tier vs the flat
  * local scan at the bench operating point (50k x 128): same corpus,
  * same queries, QPS side by side plus measured scan fraction and the
  * train() build cost — evidence for the ref_ivf_qps_50k tier. */
object IvfServeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("8", appName = "ivf-serve-probe")
    import spark.implicits._
    val dim = 128
    val rnd = new scala.util.Random(42)
    val embDf = (0 until 50000).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val index = graft.store.QuantizedIndex.build(embDf, dim, numBlocks = 32).persist()
    index.count
    val qrnd = new scala.util.Random(7)
    val queries = (0 until 100).map(_ =>
      VectorKernels.quantize(Array.fill(dim)(qrnd.nextGaussian().toFloat))).toArray
    val local = index.toLocal
    val rows = embDf.collect()
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Float](1).toArray)
    val t0 = System.nanoTime()
    val ivf = graft.store.LocalIvfIndex.train(ids, vecs, numCells = 64)
    println(f"train_sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    val frac = queries.take(20).map(q => ivf.probedRows(q, 8).toDouble / ivf.count)
    println(f"scan_frac(nprobe=8/64)=${frac.sum / frac.length}%.3f")
    (0 until 10).foreach(i => local.search(queries(i), 10))
    (0 until 10).foreach(i => ivf.search(queries(i), 10, 8))
    for (_ <- 0 until 3) {
      val tf = System.nanoTime(); queries.foreach(q => local.search(q, 10))
      val flatS = (System.nanoTime() - tf) / 1e9
      val ti = System.nanoTime(); queries.foreach(q => ivf.search(q, 10, 8))
      val ivfS = (System.nanoTime() - ti) / 1e9
      println(f"flat_qps=${100 / flatS}%.0f ivf_qps=${100 / ivfS}%.0f")
    }
    // component timings: route-only vs full search
    val tr = System.nanoTime()
    (0 until 1000).foreach(i => ivf.routeOnly(queries(i % 100), 8))
    println(f"route_us=${(System.nanoTime() - tr) / 1e3 / 1000}%.1f")
    // recall on the random corpus at this operating point (documented,
    // not gated here — the spec gates the clustered fixtures)
    val rec = queries.take(20).map { q =>
      val truth = local.search(q, 10).map(_._1).toSet
      val got = ivf.search(q, 10, 8).map(_._1).toSet
      (truth intersect got).size / 10.0
    }
    println(f"recall_random(nprobe=8/64)=${rec.sum / rec.length}%.2f")
    index.unpersist(); spark.stop()
  }
}
