package graft.functions

/** Bit-interleaving kernels behind the z-order data-layout operator
  * (ops/LayoutQueries.scala). Pure integer math — bitwise-identical on
  * every engine, so the DuckDB oracle recomputes it exactly (via a
  * generate_series bit sum; see the q_zorder_layout oracle).
  */
object LayoutKernels {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into one z-value: bit i of x lands at position 2i, bit i
    * of y at 2i+1. `bits` <= 31 so the result fits a non-negative Long.
    * Morton/z-order curve: lexicographic order on z-values visits the
    * (x, y) grid in nested quadrants, so a contiguous z-range is a small
    * set of axis-aligned rectangles — the property file-level min/max
    * skipping exploits on BOTH dimensions at once.
    */
  def interleave2(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Inverse of interleave2 (spec roundtrip property). */
  def deinterleave2(z: Long, bits: Int): (Long, Long) = {
    var x = 0L
    var y = 0L
    var i = 0
    while (i < bits) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }
}
