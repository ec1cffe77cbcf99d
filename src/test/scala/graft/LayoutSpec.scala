package graft

import graft.functions.LayoutKernels
import org.scalatest.funsuite.AnyFunSuite

/** Kernel laws for the z-order interleave (pure, no Spark). */
class LayoutKernelSpec extends AnyFunSuite {

  test("interleave2/deinterleave2 roundtrip over a seeded 16-bit sample") {
    val rnd = new scala.util.Random(777)
    (0 until 2000).foreach { _ =>
      val x = rnd.nextInt(1 << 16).toLong
      val y = rnd.nextInt(1 << 16).toLong
      val z = LayoutKernels.interleave2(x, y, 16)
      assert(z >= 0L && z < (1L << 32))
      assert(LayoutKernels.deinterleave2(z, 16) == ((x, y)))
    }
  }

  test("interleave2 places bit i of x at 2i and of y at 2i+1") {
    (0 until 16).foreach { i =>
      assert(LayoutKernels.interleave2(1L << i, 0L, 16) == (1L << (2 * i)))
      assert(LayoutKernels.interleave2(0L, 1L << i, 16) == (1L << (2 * i + 1)))
    }
    assert(LayoutKernels.interleave2(0xFFFF, 0xFFFF, 16) == 0xFFFFFFFFL)
  }

  test("z-prefix cells are axis-aligned: top 2k z-bits = top k bits of each dim") {
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val x = rnd.nextInt(1 << 16).toLong
      val y = rnd.nextInt(1 << 16).toLong
      val cell = LayoutKernels.interleave2(x, y, 16) >> 24
      assert(cell == LayoutKernels.interleave2(x >> 12, y >> 12, 4))
    }
  }
}

/** q_zorder_layout invariants at sf0.001 (the oracle gate hash-matches the
  * full result; here we assert the CLAIM the operator exists to make —
  * z-order's worst dimension beats both linear layouts' worst dimension). */
class LayoutSpec extends SparkSpec {

  test("q_zorder_layout: balanced z ranges beat the linear layouts' worst dim") {
    val rows = SparkEntry.queries("q_zorder_layout")(spark, sf001).collect()
    assert(rows.length == 3)
    val byLayout = rows.map(r => r.getAs[String]("layout") ->
      (r.getAs[Long]("n_files"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("sum_cust_range"), r.getAs[Long]("sum_date_range"))).toMap
    assert(byLayout.keySet == Set("cust", "date", "zorder"))
    // every layout partitions the same rows
    assert(byLayout.values.map(_._2).toSet.size == 1)
    val worst = byLayout.map { case (k, (_, _, c, d)) => k -> math.max(c, d) }
    // a linear sort is near-perfect on its own column...
    assert(byLayout("cust")._3 < byLayout("cust")._4)
    assert(byLayout("date")._4 < byLayout("date")._3)
    // ...and full-width on the other; z-order's worst dim wins overall
    assert(worst("zorder") < worst("cust"))
    assert(worst("zorder") < worst("date"))
  }
}
