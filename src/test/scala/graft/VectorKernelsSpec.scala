package graft

import graft.functions.VectorKernels._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the kernel semantics (SURVEY.md §5.2) —
  * seeded-random sampling (no external generator deps needed). */
class VectorKernelsSpec extends AnyFunSuite {

  private def randVec(rnd: scala.util.Random, n: Int): Array[Float] =
    Array.fill(n)((rnd.nextFloat() - 0.5f) * 20f)

  test("quantized self-similarity is 1 within one ulp for nonzero vectors") {
    // dot/(sqrt(n)*sqrt(n)) can differ from 1.0 by 1 ulp; both the engine
    // and the DuckDB oracle share the exact same arithmetic, so parity holds.
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val v = randVec(rnd, 2 + rnd.nextInt(63))
      if (l2norm(v) > 1e-6) {
        val q = quantize(v)
        assert(math.abs(cosineInt8(q, q) - 1.0) <= 3e-16)
      }
    }
  }

  test("scores lie in [-1, 1]") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val n = 2 + rnd.nextInt(63)
      val (a, b) = (randVec(rnd, n), randVec(rnd, n))
      val s = cosineInt8(quantize(a), quantize(b))
      assert(s >= -1.0000001 && s <= 1.0000001)
      val f = cosineFloat(a, b)
      assert(f >= -1.0000001 && f <= 1.0000001)
    }
  }

  test("zero-norm vectors quantize to zeros and score 0") {
    val z = Array.fill(8)(0f)
    assert(quantize(z).forall(_ == 0))
    val v = Array.fill(8)(1f)
    assert(cosineInt8(quantize(z), quantize(v)) == 0.0)
    assert(cosineFloat(z, v) == 0.0)
  }

  test("quantization roundtrip error per component <= 1/127") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val v = randVec(rnd, 2 + rnd.nextInt(63))
      if (l2norm(v) > 1e-6) {
        val nrm = l2norm(v)
        val deq = dequantize(quantize(v))
        v.indices.foreach { i =>
          val err = math.abs(v(i) / nrm - deq(i))
          assert(err <= 1.0 / 127.0 + 1e-9, s"component $i err $err")
        }
      }
    }
  }

  test("quantization truncates toward zero (reference semantics)") {
    // 0.6/0.8 unit vector -> 76.2 / 101.6 -> trunc 76 / 101 (not round)
    val v = Array(0.6f, 0.8f)
    assert(quantize(v).toSeq == Seq[Byte](76, 101))
    val n = Array(-0.6f, 0.8f)
    assert(quantize(n).toSeq == Seq[Byte](-76, 101))
  }

  test("non-finite detection") {
    assert(hasNonFinite(Array(1f, Float.NaN)))
    assert(hasNonFinite(Array(Float.PositiveInfinity)))
    assert(hasNonFinite(Array(Float.NegativeInfinity, 0f)))
    assert(!hasNonFinite(Array(1f, -2f, 0f)))
  }

  test("cosineFloat is invariant to positive scaling") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 100) {
      val v = randVec(rnd, 16)
      val c = 0.1f + rnd.nextFloat() * 5f
      if (l2norm(v) > 1e-3) {
        val s1 = cosineFloat(v, v)
        val s2 = cosineFloat(v, v.map(_ * c))
        assert(math.abs(s1 - s2) < 1e-5)
      }
    }
  }

  test("top-k of knn is a prefix of top-(k+1) (kernel-level ordering sanity)") {
    val rnd = new scala.util.Random(5)
    val corpus = Array.fill(50)(randVec(rnd, 16))
    val q = quantize(randVec(rnd, 16))
    val scored = corpus.zipWithIndex
      .map { case (v, i) => (i, cosineInt8(quantize(v), q)) }
      .sortBy { case (i, s) => (-s, i) }
    val top5 = scored.take(5).map(_._1).toSeq
    val top6 = scored.take(6).map(_._1).toSeq
    assert(top6.startsWith(top5))
  }
}
