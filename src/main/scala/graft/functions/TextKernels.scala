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

  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Distinct word-trigram shingles of a token array, order of first
    * occurrence — exactly `array_distinct(transform(sequence(0, n-3),
    * i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))` for n >= 3 tokens
    * (callers filter shorter rows upstream; n < 3 yields an empty array
    * here rather than the HOF's element_at(0) error). One pass, one
    * LinkedHashSet; exists because ArrayTransform/ArraySequence are
    * CodegenFallback and this is the dedup pipeline's hottest projection. */
  def shingle3(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i <= n - 3) {
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(Space,
        toks.getUTF8String(i), toks.getUTF8String(i + 1),
        toks.getUTF8String(i + 2)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private val RepSum: java.util.function.BiFunction[Integer, Integer, Integer] =
    (a: Integer, b: Integer) => Integer.valueOf(a.intValue() + b.intValue())

  /** Token-level repetition statistics (the Gopher/Rae-et-al repetition
    * quality rules, restated over whitespace tokens because the synthetic
    * docs carry no line structure): returns [top2, n2, dup3, n3] where
    *  - top2 = occurrences of the modal consecutive token 2-gram,
    *  - n2   = total 2-gram positions (n-1),
    *  - dup3 = 3-gram positions whose 3-gram occurs more than once,
    *  - n3   = total 3-gram positions (n-2).
    * top2/n2 is the "fraction in most common 2-gram" signal; dup3/n3 the
    * "fraction in duplicated 3-grams" signal. One pass, two count maps;
    * callers filter n < 3 upstream (shorter inputs yield zero counts, not
    * errors). */
  def repStats(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val bi = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    val tri = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    var i = 0
    while (i < n - 1) {
      bi.merge(org.apache.spark.unsafe.types.UTF8String.concatWs(Space,
        toks.getUTF8String(i), toks.getUTF8String(i + 1)), Integer.valueOf(1), RepSum)
      if (i < n - 2)
        tri.merge(org.apache.spark.unsafe.types.UTF8String.concatWs(Space,
          toks.getUTF8String(i), toks.getUTF8String(i + 1),
          toks.getUTF8String(i + 2)), Integer.valueOf(1), RepSum)
      i += 1
    }
    var top2 = 0L
    val bit = bi.values().iterator()
    while (bit.hasNext) { val v = bit.next().longValue(); if (v > top2) top2 = v }
    var dup3 = 0L
    val tit = tri.values().iterator()
    while (tit.hasNext) { val v = tit.next().longValue(); if (v > 1L) dup3 += v }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Long](top2, math.max(0, n - 1).toLong, dup3, math.max(0, n - 2).toLong))
  }

  /** First 60 bits of md5(s) as a non-negative long — exactly
    * `conv(substring(md5(s), 1, 15), 16, 10)`: 15 hex chars = 60 bits.
    * Used as a compact join key for shingle-equality joins (8-byte shuffle
    * key instead of a ~25-byte string). */
  def md5Prefix60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val dig = md.digest(s.getBytes)
    first60(dig)
  }

  /** Bytes 0-6 fully + high nibble of byte 7 of an md5 digest — the same
    * 60-bit reduction md5Prefix60 applies. */
  private def first60(dig: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) & 0xf0L) >>> 4)
  }

  private final val SpaceByte = ' '.toByte

  /** md5Prefix60 of the space-joined k-gram starting at token i — the md5
    * is fed token bytes + single-space separators incrementally, so the
    * digest is bit-identical to md5Prefix60(concat_ws(' ', toks[i..i+k-1]))
    * without ever building the joined string. */
  private def hashGramAt(md: java.security.MessageDigest, toks: ArrayData,
      i: Int, k: Int): Long = {
    md.reset()
    var j = 0
    while (j < k) {
      if (j > 0) md.update(SpaceByte)
      md.update(toks.getUTF8String(i + j).getBytes)
      j += 1
    }
    first60(md.digest())
  }

  /** 60-bit k-gram hashes of a token array. Non-distinct: element i is the
    * hash of the gram at position i — exactly `transform(sequence(0, n-k),
    * i -> md5Prefix60(concat_ws(' ', t[i+1..i+k])))`. Distinct: dedup BY
    * HASH in first-occurrence order — exactly `array_distinct(` the same
    * `)` (a 60-bit collision merges the same grams on both engines, the
    * set-of-hashes contract every consumer joins/intersects on). n < k
    * yields an empty array (callers filter shorter rows upstream). Exists
    * because ArrayTransform/ArraySequence are CodegenFallback and the
    * corpus-wide gram builders are the hottest projections in the
    * dedup/decontamination/selection tiers (the Shingle3Expr lesson,
    * generalized to parametric k). Tokens are assumed non-null (split()
    * output), matching shingle3. */
  def gramHash(toks: ArrayData, k: Int, distinct: Boolean): ArrayData = {
    val n = toks.numElements()
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val md = md5Local.get()
    val m = n - k + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i < m) { seen.add(hashGramAt(md, toks, i, k)); i += 1 }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      val out = new Array[Long](m)
      var i = 0
      while (i < m) { out(i) = hashGramAt(md, toks, i, k); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Occurrence counts of each literal term in a token array — one pass,
    * k counters: element i == `size(filter(toks, x -> x = terms[i]))`.
    * The codegen twin of the per-term tf projections (ArrayFilter is
    * CodegenFallback and the BM25 family runs k of them per corpus row). */
  def termCounts(toks: ArrayData,
      terms: Array[org.apache.spark.unsafe.types.UTF8String]): ArrayData = {
    val out = new Array[Long](terms.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      var j = 0
      while (j < terms.length) {
        if (terms(j).equals(t)) out(j) += 1L
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private final val HexChars = "0123456789abcdef".toCharArray

  /** md5 HEX (lowercase) of the space-joined SORTED-DISTINCT token set —
    * exactly `md5(concat_ws(' ', array_sort(array_distinct(toks))))`:
    * TreeSet ordering is UTF8String's byte-wise comparison, the same
    * ordering array_sort applies to strings, and the digest is fed
    * token bytes + single-space separators incrementally. The codegen
    * twin of the set-fingerprint projection (ArraySort/ArrayDistinct are
    * CodegenFallback and q_dedup_set runs this over the whole corpus). */
  def setFp(toks: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val n = toks.numElements()
    val set = new java.util.TreeSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < n) { set.add(toks.getUTF8String(i)); i += 1 }
    val md = md5Local.get()
    md.reset()
    val it = set.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) md.update(SpaceByte)
      md.update(it.next().getBytes)
      first = false
    }
    val dig = md.digest()
    val hex = new Array[Char](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = HexChars((dig(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexChars(dig(i) & 0xf)
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(new String(hex))
  }

  /** All-position space-joined k-gram STRINGS of a token array — exactly
    * `transform(sequence(0, n-k), i -> concat_ws(' ', t[i+1..i+k]))`; the
    * string twin of gramHash for consumers whose OUTPUT is the gram text
    * (top-ngrams, collocations). n < k yields an empty array. */
  def grams(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val buf = new Array[org.apache.spark.unsafe.types.UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { buf(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, buf: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
