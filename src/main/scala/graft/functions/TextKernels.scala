package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Scalar text-fingerprint kernels, called from codegen'd expressions
  * (same pattern as VectorKernels: tight JVM loops over catalyst-native
  * values — the Spark analog of the reference's Numba kernels,
  * pythonvectordb.py:25-151).
  */
object TextKernels {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** SimHash-32 of a (distinct, non-empty) token array. Per token the hash
    * is the first 32 bits of md5(token) taken big-endian unsigned — exactly
    * `conv(substring(md5(tok), 1, 8), 16, 10)` — each of the 32 bits votes
    * +1/-1, and fingerprint bit j is set iff its vote sum is positive.
    * One pass, no per-token allocations beyond the 16-byte digest. */
  def simhash32(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](32)
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      md.reset()
      val dig = md.digest(toks.getUTF8String(i).getBytes)
      val hv = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      var j = 0
      while (j < 32) {
        if (((hv >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }

  /** First 60 bits of md5(s) as a non-negative long — exactly
    * `conv(substring(md5(s), 1, 15), 16, 10)`: 15 hex chars = 60 bits.
    * Used as a compact join key for shingle-equality joins (8-byte shuffle
    * key instead of a ~25-byte string). */
  def md5Prefix60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val dig = md.digest(s.getBytes)
    // 7.5 bytes: bytes 0-6 fully, high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) & 0xf0L) >>> 4)
  }
}
