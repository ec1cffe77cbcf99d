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

  test("jsdE9 pins: identical mixes -> 0, disjoint supports -> ln 2, empty -> -1") {
    // identical distributions: p = q per bin, every term ln 1 = 0
    val a = sk(16, 1 -> 3L, 4 -> 5L, 9 -> 2L)
    assert(HistSketchKernels.jsdE9(a, a) === 0L)
    // scale invariance: 2x the counts is the same distribution
    val a2 = sk(16, 1 -> 6L, 4 -> 10L, 9 -> 4L)
    assert(HistSketchKernels.jsdE9(a, a2) === 0L)
    // disjoint supports: JSD = ln 2 nats exactly; the P43 snap-sum
    // truncates each bin term so the e9 reading sits at or just below
    // trunc(ln2 * 1e9) = 693147180
    val b = sk(16, 2 -> 4L, 7 -> 6L)
    val d = HistSketchKernels.jsdE9(a, b)
    assert(d <= 693147180L && d >= 693147170L, s"disjoint JSD read $d")
    // symmetry (JSD is symmetric; the walk visits the same union bins)
    assert(HistSketchKernels.jsdE9(b, a) === d)
    // empty side -> -1 sentinel, matching ksE9/w1E9
    assert(HistSketchKernels.jsdE9(sk(16), a) === -1L)
    assert(HistSketchKernels.jsdE9(a, sk(16)) === -1L)
    // a hand-replayed asymmetric case: bins {0:1} vs {0:1, 1:1} —
    // p0=1, q0=0.5, m0=0.75; q1=0.5, m1=0.25
    // t0 = 0.5*ln(4/3) + 0.25*ln(2/3); t1 = 0.25*ln 2
    val c1 = sk(4, 0 -> 1L)
    val c2 = sk(4, 0 -> 1L, 1 -> 1L)
    val p43 = 8796093022208.0
    val t0 = 1.0 * math.log(1.0 / 0.75) * 0.5 + 0.5 * math.log(0.5 / 0.75) * 0.5
    val t1 = 0.5 * math.log(0.5 / 0.25) * 0.5
    val snap = math.floor(t0 * p43).toLong + math.floor(t1 * p43).toLong
    val want = (BigInt(snap) * 1000000000L / 8796093022208L).toLong
    assert(HistSketchKernels.jsdE9(c1, c2) === want)
  }
}
