package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Perceptual-hash kernels over media payloads (see ops/Multimodal for the
  * real-codec luminance path). The hash is a LINEARIZED dHash (difference
  * hash, the classic image near-dup fingerprint): a fixed grid of
  * luminance cells, one bit per adjacent-cell comparison, packed into a
  * BIGINT. 64 cells -> 63 comparison bits, so the packed value stays
  * non-negative and both engines' integer division/modulo band
  * extraction agree (the same reason q_simhash stops at 32 bits: DuckDB's
  * BIGINT power(2, 63) would overflow).
  *
  * Two luminance sources share ONE packing (`packDHash`):
  *  - real images (ops/Multimodal.lumGrid8x8): ImageIO decode, 8x8
  *    block-averaged BT.601 luminance — the production path, pinned on
  *    real PNG bytes in MultimodalSpec;
  *  - arbitrary binary payloads (`byteLumGrid`): 64 equal slices of the
  *    byte stream, cell = sum of unsigned byte values — the
  *    codec-independent fallback, and the path the DuckDB oracle can
  *    replay with exact integer arithmetic (ord/substr sums).
  * Byte-sum "luminance" is deliberately an AVERAGED statistic, not a
  * rolling hash: small edits perturb one cell slightly instead of
  * rerandomizing it, which is exactly the locality a perceptual hash
  * needs (and why near-dup payloads land at Hamming <= 4 of 63).
  */
object MediaKernels {

  /** 64-cell luminance grid over a byte payload: cell i sums the unsigned
    * bytes of slice [floor(i*len/64), floor((i+1)*len/64)). Requires
    * len >= 64 so every cell is non-empty (enforced by the query-side
    * length filter, mirrored in the oracle's WHERE). */
  def byteLumGrid(payload: Array[Byte]): Array[Long] = {
    val cells = 64
    val len = payload.length
    val lum = new Array[Long](cells)
    var i = 0
    while (i < cells) {
      var p = (i.toLong * len / cells).toInt
      val end = ((i + 1).toLong * len / cells).toInt
      var s = 0L
      while (p < end) { s += payload(p) & 0xff; p += 1 }
      lum(i) = s
      i += 1
    }
    lum
  }

  /** Pack adjacent-cell comparisons into a dHash: bit j set iff
    * lum(j) > lum(j+1), j in [0, n-2] — at most 63 bits so the result is
    * a non-negative BIGINT on both engines. */
  def packDHash(lum: Array[Long]): Long = {
    require(lum.length <= 64, s"dHash grid too large: ${lum.length}")
    var h = 0L
    var j = 0
    while (j < lum.length - 1) {
      if (lum(j) > lum(j + 1)) h |= 1L << j
      j += 1
    }
    h
  }

  /** binary -> 63-bit linearized dHash (byte-slice luminance). */
  def byteDHash63(payload: Array[Byte]): Long = packDHash(byteLumGrid(payload))

  /** Per-block unsigned-byte sums over `blocks` equal slices of the
    * payload — the same floor-slice formula as [[byteLumGrid]] with a
    * caller-chosen grid. The per-FRAME feature of the scene-cut detector
    * (4 blocks over a 16-byte frame = exact 4-byte quarters, which is
    * what the DuckDB oracle replays with ord/substr sums). */
  def byteBlockSums(payload: Array[Byte], blocks: Int): Array[Long] = {
    val len = payload.length
    val out = new Array[Long](blocks)
    var i = 0
    while (i < blocks) {
      var p = (i.toLong * len / blocks).toInt
      val end = ((i + 1).toLong * len / blocks).toInt
      var s = 0L
      while (p < end) { s += payload(p) & 0xff; p += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  /** Fused sum / sum-of-squares of the 64-cell luminance grid: one pass
    * building the grid ([[byteLumGrid]]), one pass folding it — the
    * contrast statistic of the image-quality gate ([sl, ss]; callers
    * derive variance*n as 64*ss - sl*sl in exact BIGINTs). Replaces an
    * interpreted per-character SQL HOF with a codegen'd kernel (the
    * q_image_quality round-12 fix). */
  def gridStats(payload: Array[Byte]): Array[Long] = {
    val lum = byteLumGrid(payload)
    var sl = 0L
    var ss = 0L
    var i = 0
    while (i < lum.length) { sl += lum(i); ss += lum(i) * lum(i); i += 1 }
    Array(sl, ss)
  }

  /** Per-frame energy over consecutive `frameLen`-byte frames (full
    * frames only — the trailing partial frame is dropped, matching the
    * `L div frameLen` frame count): energy = sum of squared
    * `center`-offset unsigned samples, exact BIGINTs. The VAD-lite
    * feature of the audio segmenter, one codegen'd pass per payload. */
  def frameEnergies(payload: Array[Byte], frameLen: Int, center: Int): Array[Long] = {
    val n = payload.length / frameLen
    val out = new Array[Long](n)
    var f = 0
    while (f < n) {
      var p = f * frameLen
      val end = p + frameLen
      var s = 0L
      while (p < end) {
        val d = (payload(p) & 0xff) - center
        s += d.toLong * d
        p += 1
      }
      out(f) = s
      f += 1
    }
    out
  }

  /** ArrayData adapters for the codegen'd expressions. */
  def gridStatsAD(payload: Array[Byte])
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(gridStats(payload))

  def frameEnergiesAD(payload: Array[Byte], frameLen: Int, center: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      frameEnergies(payload, frameLen, center))

  def byteBlockSumsAD(payload: Array[Byte], blocks: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      byteBlockSums(payload, blocks))

  def l1DistAD(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long =
    l1Dist(a.toLongArray(), b.toLongArray())

  /** L1 distance between two equal-length long vectors. Lengths must
    * match — a silent min-length compare would report a WRONG distance
    * (the hammingPacked lesson). */
  def l1Dist(a: Array[Long], b: Array[Long]): Long = {
    require(a.length == b.length,
      s"l1Dist: length mismatch ${a.length} vs ${b.length}")
    var s = 0L
    var i = 0
    while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
    s
  }
}

/** binary -> bigint: 63-bit linearized dHash over the byte-slice luminance
  * grid (MediaKernels.byteDHash63), kept inside WholeStageCodegen. */
case class DHash63Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dhash63"

  override def nullSafeEval(v: Any): Any =
    MediaKernels.byteDHash63(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaKernels.byteDHash63($c)")

  override protected def withNewChildInternal(c: Expression): DHash63Expr =
    copy(child = c)
}

/** binary -> array<bigint>: per-block unsigned-byte sums over `blocks`
  * equal slices (MediaKernels.byteBlockSums) — the per-frame feature of
  * the scene-cut detector, inside WholeStageCodegen. */
case class BlockSumsExpr(child: Expression, blocks: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if blocks > 0 => TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires blocks > 0, got $blocks")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "block_sums"

  override def nullSafeEval(v: Any): Any =
    MediaKernels.byteBlockSumsAD(v.asInstanceOf[Array[Byte]], blocks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MediaKernels.byteBlockSumsAD($c, $blocks)")

  override protected def withNewChildInternal(c: Expression): BlockSumsExpr =
    copy(child = c)
}

/** binary -> array<bigint> [sl, ss]: fused sum / sum-of-squares of the
  * 64-cell byte-slice luminance grid (MediaKernels.gridStats) — the
  * image-quality contrast statistic inside WholeStageCodegen. */
case class GridStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "grid_stats"

  override def nullSafeEval(v: Any): Any =
    MediaKernels.gridStatsAD(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaKernels.gridStatsAD($c)")

  override protected def withNewChildInternal(c: Expression): GridStatsExpr =
    copy(child = c)
}

/** binary -> array<bigint>: per-frame `center`-offset squared-sample
  * energies over consecutive `frameLen`-byte full frames
  * (MediaKernels.frameEnergies) — the VAD-lite feature, inside
  * WholeStageCodegen. */
case class FrameEnergiesExpr(child: Expression, frameLen: Int, center: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if frameLen > 0 => TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires frameLen > 0, got $frameLen")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "frame_energies"

  override def nullSafeEval(v: Any): Any =
    MediaKernels.frameEnergiesAD(v.asInstanceOf[Array[Byte]], frameLen, center)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MediaKernels.frameEnergiesAD($c, $frameLen, $center)")

  override protected def withNewChildInternal(c: Expression): FrameEnergiesExpr =
    copy(child = c)
}

/** (array<bigint>, array<bigint>) -> bigint: exact L1 distance; raises on
  * length mismatch rather than silently comparing a prefix. */
case class L1DistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l1_dist"

  override def nullSafeEval(a: Any, b: Any): Any =
    MediaKernels.l1DistAD(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.MediaKernels.l1DistAD($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): L1DistExpr = copy(left = l, right = r)
}
