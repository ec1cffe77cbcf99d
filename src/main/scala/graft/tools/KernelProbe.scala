package graft.tools

import jdk.incubator.vector._

/** Throwaway micro-probe: compares inner-loop variants for the LocalIndex
  * scan kernel on a 50k x 128 corpus — drives the kernel choice for the
  * serving tier. Not part of the engine surface. */
object KernelProbe {

  val n = 50000
  val dim = 128

  def scanByte(data: Array[Byte], q: Array[Byte], out: Array[Int]): Unit = {
    var row = 0
    while (row < n) {
      var dot = 0; var j = row * dim; var i = 0
      while (i < dim) { dot += data(j) * q(i); j += 1; i += 1 }
      out(row) = dot; row += 1
    }
  }

  private val IS = IntVector.SPECIES_PREFERRED

  def scanIntVec(data: Array[Int], q: Array[Int], out: Array[Int]): Unit = {
    val step = IS.length()
    var row = 0
    while (row < n) {
      val base = row * dim
      var acc = IntVector.zero(IS)
      var i = 0
      while (i < dim) {
        acc = IntVector.fromArray(IS, data, base + i)
          .mul(IntVector.fromArray(IS, q, i)).add(acc)
        i += step
      }
      out(row) = acc.reduceLanes(VectorOperators.ADD)
      row += 1
    }
  }

  private val SS = ShortVector.SPECIES_PREFERRED

  def scanShortVec(data: Array[Short], q: Array[Short], out: Array[Int]): Unit = {
    val step = SS.length()
    var row = 0
    while (row < n) {
      val base = row * dim
      var acc0 = IntVector.zero(IS)
      var acc1 = IntVector.zero(IS)
      var i = 0
      while (i < dim) {
        val prod = ShortVector.fromArray(SS, data, base + i)
          .mul(ShortVector.fromArray(SS, q, i))
        acc0 = acc0.add(prod.convert(VectorOperators.S2I, 0).asInstanceOf[IntVector])
        acc1 = acc1.add(prod.convert(VectorOperators.S2I, 1).asInstanceOf[IntVector])
        i += step
      }
      out(row) = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
      row += 1
    }
  }

  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val data = Array.fill[Byte](n * dim)((rnd.nextInt(255) - 127).toByte)
    val q = Array.fill[Byte](dim)((rnd.nextInt(255) - 127).toByte)
    val dataInt = data.map(_.toInt)
    val qInt = q.map(_.toInt)
    val dataShort = data.map(_.toShort)
    val qShort = q.map(_.toShort)
    val out = new Array[Int](n)

    println(s"int species: $IS, short species: $SS")
    def bench(name: String)(f: () => Unit): Unit = {
      (0 until 50).foreach(_ => f()) // heavy warmup -> C2
      val reps = 50
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => f())
      val per = (System.nanoTime() - t0) / 1e6 / reps
      println(f"$name%-24s ${per}%8.3f ms/scan  (${n.toLong * dim / per / 1e3}%8.0f MMAC/s)")
    }
    bench("byte scalar")(() => scanByte(data, q, out))
    bench("int vector-api")(() => scanIntVec(dataInt, qInt, out))
    bench("short vector-api")(() => scanShortVec(dataShort, qShort, out))
    println(out(12345))
  }
}
