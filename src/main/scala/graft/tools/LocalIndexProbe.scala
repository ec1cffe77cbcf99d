package graft.tools

import graft.functions.VectorKernels
import graft.store.{LocalIndex, VectorBlock}

/** Throwaway probe: LocalIndex sequential-search QPS at the reference's
  * operating point (50k x 128, k=10), without any Spark session. */
object LocalIndexProbe {
  def main(args: Array[String]): Unit = {
    val n = 50000
    val dim = 128
    val rnd = new scala.util.Random(42)
    println(s"simd available: ${graft.functions.SimdSupport.available}")
    val nBlocks = 32
    val per = n / nBlocks
    val blocks = (0 until nBlocks).map { b =>
      val ids = Array.tabulate(per)(i => (b * per + i).toLong)
      val data = new Array[Byte](per * dim)
      var i = 0
      while (i < per) {
        val q = VectorKernels.quantize(Array.fill(dim)(rnd.nextGaussian().toFloat))
        System.arraycopy(q, 0, data, i * dim, dim)
        i += 1
      }
      VectorBlock(ids, data, dim)
    }.toArray
    val idx = new LocalIndex(blocks, dim)
    val qrnd = new scala.util.Random(7)
    val queries = Array.fill(100)(
      VectorKernels.quantize(Array.fill(dim)(qrnd.nextGaussian().toFloat)))
    (0 until 500).foreach(i => idx.search(queries(i % 100), 10)) // warm -> C2
    (0 until 5).foreach { rep =>
      val t0 = System.nanoTime()
      queries.foreach(q => idx.search(q, 10))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"rep $rep: ${100 / sec}%6.0f QPS (${sec * 10}%.3f ms/query)")
    }
  }
}
