package graft.functions

/** Pure-JVM vector kernels — the Spark-side ground truth for the engine's
  * quantize / cosine semantics.
  *
  * Semantics mirror the reference engine's four Numba kernels
  * (reference: pythonvectordb.py:25-151):
  *   - L2 normalize with a `< 1e-10` zero-norm guard (pythonvectordb.py:70-99)
  *   - int8 quantization `trunc(x * 127)` clamped to [-128, 127], truncation
  *     toward zero, NOT rounding (pythonvectordb.py:102-127)
  *   - cosine over quantized vectors; since both sides are renormalized the
  *     1/127 dequantization scale cancels (pythonvectordb.py:25-67)
  *
  * All accumulations are strict left-to-right folds in Double so that the
  * DuckDB oracle (`list_reduce(list_prepend(0.0, ...), (a,b) -> a+b)`) is
  * bit-for-bit reproducible. Int8 dot products accumulate in Long (exact),
  * making the quantized cosine score deterministic across engines.
  */
object VectorKernels {

  final val ZeroNormEps = 1e-10

  /** Left-to-right fold of sum(x_i^2) in Double. */
  def l2normSq(v: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }
    s
  }

  def l2norm(v: Array[Float]): Double = math.sqrt(l2normSq(v))

  /** Normalize then quantize to int8 with truncation toward zero.
    * Mirrors SQL: CAST(LEAST(127.0, GREATEST(-128.0, trunc(x/nrm*127.0))) AS INT).
    * Zero-norm (< 1e-10) input quantizes to the all-zero vector. */
  def quantize(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length)
    val nrm = l2norm(v)
    if (nrm < ZeroNormEps) return out
    var i = 0
    while (i < v.length) {
      val t = trunc(v(i).toDouble / nrm * 127.0)
      val c = math.min(127.0, math.max(-128.0, t))
      out(i) = c.toInt.toByte
      i += 1
    }
    out
  }

  /** Truncation toward zero (matches numpy int8 cast and SQL TRUNC). */
  @inline private def trunc(d: Double): Double =
    if (d < 0) math.ceil(d) else math.floor(d)

  /** Cosine similarity between two int8-quantized vectors. Integer (Long)
    * accumulation => exact; score is deterministic double arithmetic.
    * Either side with zero norm scores 0.0 (pythonvectordb.py:46-48, 64-65). */
  def cosineInt8(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length,
      s"dimension mismatch: ${a.length} vs ${b.length}") // pythonvectordb.py:354-357
    val n = a.length
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      dot += a(i).toLong * b(i).toLong
      na += a(i).toLong * a(i).toLong
      nb += b(i).toLong * b(i).toLong
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Exact integer dot product of two int8 vectors. */
  def dotInt8(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length,
      s"dimension mismatch: ${a.length} vs ${b.length}")
    val n = a.length
    var dot = 0L
    var i = 0
    while (i < n) { dot += a(i).toLong * b(i).toLong; i += 1 }
    dot
  }

  /** Exact integer squared norm of an int8 vector. */
  def normSqInt8(a: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i).toLong * a(i).toLong; i += 1 }
    s
  }

  /** Cosine from precomputed integer norms — bitwise identical to
    * cosineInt8 (same Double expression tree on the same exact integers). */
  @inline def cosineFromParts(dot: Long, na: Long, nb: Long): Double =
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))

  /** Cosine over raw float vectors; Double left-fold accumulation mirrors
    * the DuckDB list_reduce oracle exactly. */
  def cosineFloat(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length,
      s"dimension mismatch: ${a.length} vs ${b.length}")
    val n = a.length
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Cosine of a raw FLOAT query against a DEQUANTIZED int8 stored vector —
    * the reference's actual search scoring (pythonvectordb.py:25-67): the
    * stored row is dequantized by 1/127 (:50, :57) and dotted with the raw
    * query, so only the stored side carries quantization error. Query norm
    * < 1e-10 -> 0.0 for every row (:46-48); stored norm < 1e-10 -> 0.0
    * (:64-65). Double accumulation, left-to-right fold. */
  def cosineFloatInt8(query: Array[Float], q: Array[Byte]): Double = {
    require(query.length == q.length,
      s"dimension mismatch: ${query.length} vs ${q.length}")
    val n = query.length
    var dot = 0.0
    var nq = 0.0
    var nv = 0.0
    var i = 0
    while (i < n) {
      val x = query(i).toDouble
      val y = q(i).toDouble / 127.0
      dot += x * y
      nq += x * x
      nv += y * y
      i += 1
    }
    if (math.sqrt(nq) < ZeroNormEps || math.sqrt(nv) < ZeroNormEps) 0.0
    else dot / (math.sqrt(nq) * math.sqrt(nv))
  }

  /** `cosineFloatInt8` over one row of a PACKED int8 corpus (row-major,
    * base offset) — the identical loop body and accumulation order, so the
    * score is bitwise equal to the array version (asserted in SimdSpec).
    * Used by the in-process store replica to scan without per-row copies. */
  def cosineFloatInt8Packed(
      query: Array[Float], data: Array[Byte], base: Int): Double = {
    val n = query.length
    var dot = 0.0
    var nq = 0.0
    var nv = 0.0
    var i = 0
    while (i < n) {
      val x = query(i).toDouble
      val y = data(base + i).toDouble / 127.0
      dot += x * y
      nq += x * x
      nv += y * y
      i += 1
    }
    if (math.sqrt(nq) < ZeroNormEps || math.sqrt(nv) < ZeroNormEps) 0.0
    else dot / (math.sqrt(nq) * math.sqrt(nv))
  }

  /** Dequantize an int8 vector back to doubles (q / 127.0), the `get_vector`
    * read path (pythonvectordb.py:404-423). */
  def dequantize(q: Array[Byte]): Array[Double] = {
    val out = new Array[Double](q.length)
    var i = 0
    while (i < q.length) { out(i) = q(i).toDouble / 127.0; i += 1 }
    out
  }

  /** Sign-LSH bucket ids for `tables` tables of `bits` hyperplanes, planes
    * flattened as [(t*bits + j)*dim + i]. Dot products accumulate left to
    * right from 0.0 — bitwise identical to the declarative
    * `aggregate(zip_with(e, plane, _*_), 0.0, _+_)` fold and to the DuckDB
    * oracle's list_reduce, so every sign bit (and bucket) matches both. */
  def signBuckets(e: Array[Float], planes: Array[Double],
                  tables: Int, bits: Int): Array[Int] = {
    val dim = e.length
    require(planes.length == tables * bits * dim,
      s"plane matrix ${planes.length} != $tables*$bits*$dim")
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        val off = (t * bits + j) * dim
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += e(i).toDouble * planes(off + i); i += 1 }
        if (acc >= 0) bucket |= 1 << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  /** True if any component is NaN or +/-Inf (insert validation,
    * pythonvectordb.py:284-285). */
  def hasNonFinite(v: Array[Float]): Boolean = {
    var i = 0
    while (i < v.length) {
      val x = v(i)
      if (x.isNaN || x.isInfinite) return true
      i += 1
    }
    false
  }
}
