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
