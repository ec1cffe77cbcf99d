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

  /** Max absolute per-component quantization error of a row:
    * max_i |v_i/nrm - q_i/127.0| over the row's own int8 quantization,
    * with the < 1e-10 zero-norm guard -> 0.0 — exactly the
    * when/zip_with/aggregate(greatest) HOF it replaces (q_quant_error's
    * corpus-wide projection; ArrayAggregate/ZipWith are CodegenFallback).
    * The greatest-fold from 0.0 equals a plain max because every
    * summand is non-negative. */
  def quantErr(v: Array[Float]): Double = {
    val nrm = l2norm(v)
    if (nrm < ZeroNormEps) return 0.0
    val q = quantize(v)
    var m = 0.0
    var i = 0
    while (i < v.length) {
      val d = math.abs(v(i).toDouble / nrm - q(i).toDouble / 127.0)
      if (d > m) m = d
      i += 1
    }
    m
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

  /** Exact euclidean (L2) distance over raw float vectors with the same
    * sequential double accumulation order as [[cosineFloat]] — the oracle
    * replays it with a left-fold, so the doubles match bitwise. */
  def l2Float(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length,
      s"dimension mismatch: ${a.length} vs ${b.length}")
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

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

  // ---------------------------------------------------------------------
  // Product quantization (PQ). The vector is split into `m` contiguous
  // subspaces of dim/m components each; every subspace is coded as the id
  // of its nearest codebook centroid (Lloyd's-trained, k per subspace), so
  // a dim-D float vector (4*D bytes) compresses to m bytes (dim 64, m=8
  // -> 32x; dim 128 -> 64x) — the residency step BEYOND int8 scalar
  // quantization (D bytes) on the 100 TB path. Queries score compressed rows via an ADC lookup table
  // (lut[sub*k+c] = <q_sub, centroid_c>): one table of m*k dots per query,
  // then each row costs m table reads instead of dim multiplies.
  //
  // Codebook layout: flat double[], centroid component
  // [(sub*k + c)*subdim + i]. All PQ kernels normalize the raw float
  // vector internally with the same double-fold + <1e-10 zero guard as
  // `quantize` (pythonvectordb.py:70-99), so trainer, encoder and LUT
  // agree bitwise on the vector they see.
  // ---------------------------------------------------------------------

  /** Unit-normalize into doubles (x / l2norm), zero-norm guard -> zeros.
    * Bitwise identical to VectorOps.normalize (the K2 Catalyst HOF). */
  def normalizeD(v: Array[Float]): Array[Double] = {
    val out = new Array[Double](v.length)
    val nrm = l2norm(v)
    if (nrm < ZeroNormEps) return out
    var i = 0
    while (i < v.length) { out(i) = v(i).toDouble / nrm; i += 1 }
    out
  }

  /** PQ code per subspace: argmin_c ||nv_sub - centroid_c||^2, ties to the
    * lowest c (deterministic). Returns one int per subspace in [0, k). */
  def pqCodes(v: Array[Float], codebook: Array[Double], m: Int, k: Int): Array[Int] = {
    val dim = v.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subdim = dim / m
    require(codebook.length == m * k * subdim,
      s"codebook ${codebook.length} != $m*$k*$subdim")
    val nv = normalizeD(v)
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (sub * k + c) * subdim
        var d = 0.0
        var i = 0
        while (i < subdim) {
          val diff = nv(sub * subdim + i) - codebook(off + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(sub) = best
      sub += 1
    }
    out
  }

  /** PQ codes packed one byte per subspace (k <= 256) — the stored form. */
  def pqEncode(v: Array[Float], codebook: Array[Double], m: Int, k: Int): Array[Byte] = {
    require(k <= 256, s"k=$k does not fit one byte per code")
    val codes = pqCodes(v, codebook, m, k)
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) { out(i) = codes(i).toByte; i += 1 }
    out
  }

  /** ADC lookup table for a query: lut[sub*k + c] = <nq_sub, centroid_c>
    * (double left fold). sum_sub lut[sub*k + code_sub] then approximates
    * cosine(q, v) because both sides are unit vectors. */
  def pqLut(q: Array[Float], codebook: Array[Double], m: Int, k: Int): Array[Double] = {
    val dim = q.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subdim = dim / m
    require(codebook.length == m * k * subdim,
      s"codebook ${codebook.length} != $m*$k*$subdim")
    val nq = normalizeD(q)
    val lut = new Array[Double](m * k)
    var sub = 0
    while (sub < m) {
      var c = 0
      while (c < k) {
        val off = (sub * k + c) * subdim
        var acc = 0.0
        var i = 0
        while (i < subdim) { acc += nq(sub * subdim + i) * codebook(off + i); i += 1 }
        lut(sub * k + c) = acc
        c += 1
      }
      sub += 1
    }
    lut
  }

  /** Approximate cosine of the LUT's query vs a PQ-coded row: m unsigned
    * byte reads + adds — no per-row float math at all. */
  def pqAdc(codes: Array[Byte], lut: Array[Double], k: Int): Double = {
    var acc = 0.0
    var sub = 0
    while (sub < codes.length) {
      acc += lut(sub * k + (codes(sub) & 0xff))
      sub += 1
    }
    acc
  }

  // ---------------------------------------------------------------------
  // OPQ (Ge et al., "Optimized Product Quantization", CVPR 2013): a
  // learned orthogonal rotation applied before PQ so the subspace split
  // aligns with the data's principal structure. The rotation is a flat
  // row-major dim x dim double[] baked into codegen'd expressions; the
  // kernels below are the per-row pieces (rotate; decode; residual error)
  // — training's Procrustes step lives driver-side (64x64 SVD).
  // ---------------------------------------------------------------------

  /** y = x . R (row-vector convention: y_j = sum_i x_i R[i*dim+j]),
    * accumulated in double, emitted as float so every downstream PQ
    * kernel (which re-normalizes internally) sees the same physical type
    * as an unrotated embedding. Rotation preserves the L2 norm, so
    * normalize-then-rotate and rotate-then-normalize agree to float
    * rounding. */
  def rotateFloat(v: Array[Float], r: Array[Double]): Array[Float] = {
    val d = v.length
    require(r.length == d * d, s"rotation ${r.length} != $d*$d")
    val out = new Array[Float](d)
    var j = 0
    while (j < d) {
      var acc = 0.0
      var i = 0
      while (i < d) { acc += v(i).toDouble * r(i * d + j); i += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    out
  }

  /** PQ reconstruction x^ = concat(centroid_code_sub): the decoded
    * approximation of the normalized input under the codebook. The
    * Procrustes correlation matrix X^T X^ is accumulated from this. */
  def pqReconstruct(v: Array[Float], codebook: Array[Double], m: Int, k: Int): Array[Double] = {
    val dim = v.length
    val subdim = dim / m
    val codes = pqCodes(v, codebook, m, k)
    val out = new Array[Double](dim)
    var sub = 0
    while (sub < m) {
      System.arraycopy(codebook, (sub * k + codes(sub)) * subdim, out, sub * subdim, subdim)
      sub += 1
    }
    out
  }

  /** Squared quantization error ||normalize(v) - reconstruct(v)||^2 —
    * the objective OPQ minimizes; measured per row, averaged by the
    * caller to compare rotations at equal codebook budget. */
  def pqError(v: Array[Float], codebook: Array[Double], m: Int, k: Int): Double = {
    val nv = normalizeD(v)
    val rec = pqReconstruct(v, codebook, m, k)
    var acc = 0.0
    var i = 0
    while (i < nv.length) {
      val diff = nv(i) - rec(i)
      acc += diff * diff
      i += 1
    }
    acc
  }
  /** Binary (1-bit) sign quantization: bit (w*64 + j) of output word w is
    * set iff component w*64+j is STRICTLY positive (zeros and negatives
    * clear) — ceil(dim/64) longs, i.e. dim bits vs dim*32 for float32.
    * The sign of a component is invariant under L2 normalization, so the
    * packed code of a vector equals the packed code of its normalization
    * and sign-bit Hamming distance approximates angular distance (the
    * 1-bit LSH bound of Charikar, STOC 2002, with the coordinate axes as
    * hyperplanes). */
  def signPack(v: Array[Float]): Array[Long] = {
    val words = new Array[Long]((v.length + 63) >>> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    words
  }

  /** Hamming distance between two equal-length packed sign codes: exact
    * integer popcount of the XOR, so scores are deterministic. Lengths
    * must match — a silent min-length loop would under-count the distance
    * of the longer code (HammingExpr exposes this to arbitrary
    * array<bigint> columns, so the guard is a data-quality check too). */
  def hammingPacked(a: Array[Long], b: Array[Long]): Long = {
    require(a.length == b.length,
      s"hammingPacked: code lengths differ (${a.length} vs ${b.length})")
    var s = 0L
    var i = 0
    while (i < a.length) {
      s += java.lang.Long.bitCount(a(i) ^ b(i))
      i += 1
    }
    s
  }
}
