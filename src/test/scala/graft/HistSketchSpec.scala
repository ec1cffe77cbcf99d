package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HistMergeAgg, HistSketchKernels}

/** Kernel pins for the fixed-grid histogram sketch (functions/HistSketch
  * .scala) — the deterministic mergeable-quantile layer under
  * q_quantile_merge. Pure JVM: the aggregate plumbing is exercised
  * end-to-end by the oracle gate; these pin the wire format and the
  * ceil-rank rule at the boundaries the fixture may never hit.
  */
class HistSketchSpec extends AnyFunSuite {

  private def sk(nbins: Int, pairs: (Int, Long)*): Array[Byte] = {
    val counts = new Array[Long](nbins)
    pairs.foreach { case (b, c) => counts(b) = c }
    HistSketchKernels.serialize(counts)
  }

  test("serialize/deserialize round-trip is sparse and exact") {
    val bytes = sk(4096, 0 -> 3L, 17 -> 1L, 4095 -> 9L)
    assert(bytes.length === 8 + 3 * 12)
    val counts = HistSketchKernels.mergeInto(Array.emptyLongArray, bytes)
    assert(counts.length === 4096)
    assert(counts(0) === 3L && counts(17) === 1L && counts(4095) === 9L)
    assert(counts.sum === 13L)
  }

  test("merge is count addition — bitwise lossless") {
    val a = sk(8, 1 -> 2L, 3 -> 5L)
    val b = sk(8, 3 -> 1L, 7 -> 4L)
    val m = HistSketchKernels.mergeInto(
      HistSketchKernels.mergeInto(Array.emptyLongArray, a), b)
    assert(m.toSeq === Seq(0L, 2L, 0L, 6L, 0L, 0L, 0L, 4L))
    // merged partials serialize identically to a direct build
    val direct = sk(8, 1 -> 2L, 3 -> 6L, 7 -> 4L)
    assert(HistSketchKernels.serialize(m).toSeq === direct.toSeq)
  }

  test("mergeInto refuses a width mismatch") {
    val acc = HistSketchKernels.mergeInto(Array.emptyLongArray, sk(8, 1 -> 1L))
    intercept[IllegalArgumentException] {
      HistSketchKernels.mergeInto(acc, sk(16, 1 -> 1L))
    }
  }

  test("HistMergeAgg.merge refuses a width mismatch (both directions)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = HistMergeAgg(Literal(null, org.apache.spark.sql.types.BinaryType))
    val narrow = Array(1L, 2L)
    val wide = Array(1L, 2L, 3L)
    intercept[IllegalArgumentException] { agg.merge(narrow.clone(), wide) }
    intercept[IllegalArgumentException] { agg.merge(wide.clone(), narrow) }
    // sentinel empty buffers still adopt the other side
    assert(agg.merge(Array.emptyLongArray, wide).toSeq === wide.toSeq)
    assert(agg.merge(wide.clone(), Array.emptyLongArray).toSeq === wide.toSeq)
  }

  test("rankBin applies the integer ceil-rank rule") {
    // counts: bin 2 -> 4, bin 5 -> 4, bin 9 -> 2 (N = 10)
    val bytes = sk(16, 2 -> 4L, 5 -> 4L, 9 -> 2L)
    // p50: target = ceil(10/2) = 5 -> cumulative 4 < 5 <= 8 -> bin 5
    assert(HistSketchKernels.rankBin(bytes, 1L, 2L) === 5L)
    // p40: target = 4 -> exactly exhausts bin 2
    assert(HistSketchKernels.rankBin(bytes, 2L, 5L) === 2L)
    // p90: target = 9 -> bin 9; p100: target = 10 -> last bin
    assert(HistSketchKernels.rankBin(bytes, 9L, 10L) === 9L)
    assert(HistSketchKernels.rankBin(bytes, 1L, 1L) === 9L)
    // minimum quantile lands in the first occupied bin
    assert(HistSketchKernels.rankBin(bytes, 1L, 10L) === 2L)
  }

  test("rankBin on an empty sketch is -1") {
    assert(HistSketchKernels.rankBin(sk(8), 1L, 2L) === -1L)
  }
}
