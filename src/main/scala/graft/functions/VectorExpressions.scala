package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd Catalyst expressions for the vector kernels (SURVEY.md §4 /
  * §7 M3): unlike Scala UDFs these stay inside WholeStageCodegen — no
  * catalyst<->Scala converters, no encoder round-trip per row; the generated
  * java calls the static VectorKernels methods directly on catalyst-native
  * values (byte[] for BinaryType, ArrayData for arrays).
  *
  * This is the Spark analog of the reference's Numba-JIT'd kernels
  * (pythonvectordb.py:25-151): JIT'd inner loop + columnar access.
  */


/** Type-check helpers: the expressions are SQL-registered, so arbitrary
  * input types reach them — without checks, codegen's toFloatArray() would
  * silently reinterpret e.g. array<double> bytes as floats. */
private[functions] object VecTypeCheck {
  def floatArray(e: Expression, fn: String): TypeCheckResult = e.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<float>, got ${other.catalogString}")
  }
  def binary(e: Expression, fn: String): TypeCheckResult = e.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires binary (int8 vector), got ${other.catalogString}")
  }
  def both(a: TypeCheckResult, b: => TypeCheckResult): TypeCheckResult =
    if (a.isSuccess) b else a
}

/** array<float> -> binary: unit-normalize then int8-quantize (trunc). */
case class QuantizeInt8Expr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(child, prettyName)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_int8"

  override def nullSafeEval(v: Any): Any =
    VectorKernels.quantize(v.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.quantize($c.toFloatArray())")

  override protected def withNewChildInternal(c: Expression): QuantizeInt8Expr =
    copy(child = c)
}

/** array<float> -> double: max absolute per-component int8 quantization
  * error of the row (zero-norm guard -> 0.0) — the codegen twin of the
  * when/zip_with/aggregate(greatest) HOF. */
case class QuantErrRowExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(child, prettyName)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quant_err_row"

  override def nullSafeEval(v: Any): Any =
    VectorKernels.quantErr(v.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.quantErr($c.toFloatArray())")

  override protected def withNewChildInternal(c: Expression): QuantErrRowExpr =
    copy(child = c)
}

/** binary x binary -> double: cosine over int8-quantized vectors. */
case class CosineInt8Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.both(VecTypeCheck.binary(left, prettyName),
      VecTypeCheck.binary(right, prettyName))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_int8"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineInt8(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.cosineInt8($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineInt8Expr =
    copy(left = l, right = r)
}

/** binary x binary -> bigint: EXACT integer inner product of two int8
  * vectors — the MIPS scoring metric (no floats anywhere, so cross-engine
  * parity is trivially bitwise). */
case class DotInt8Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.both(VecTypeCheck.binary(left, prettyName),
      VecTypeCheck.binary(right, prettyName))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_int8"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotInt8(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.dotInt8($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotInt8Expr =
    copy(left = l, right = r)
}

/** array<float> x array<float> -> double: euclidean distance (L2 metric). */
case class L2FloatExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.both(VecTypeCheck.floatArray(left, prettyName),
      VecTypeCheck.floatArray(right, prettyName))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_float"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2Float(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.l2Float($a.toFloatArray(), $b.toFloatArray())")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2FloatExpr =
    copy(left = l, right = r)
}

/** array<float> x array<float> -> double: cosine over raw float vectors. */
case class CosineFloatExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.both(VecTypeCheck.floatArray(left, prettyName),
      VecTypeCheck.floatArray(right, prettyName))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_float"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineFloat(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.cosineFloat($a.toFloatArray(), $b.toFloatArray())")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineFloatExpr =
    copy(left = l, right = r)
}

/** binary x array<float> -> double: cosine of a raw float query against a
  * dequantized int8 stored vector — the reference's asymmetric search
  * scoring (pythonvectordb.py:25-67; only the stored side is quantized). */
case class CosineFloatInt8Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.both(VecTypeCheck.binary(left, prettyName),
      VecTypeCheck.floatArray(right, prettyName))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_float_int8"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineFloatInt8(
      b.asInstanceOf[ArrayData].toFloatArray(), a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.cosineFloatInt8($b.toFloatArray(), $a)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineFloatInt8Expr =
    copy(left = l, right = r)
}

/** binary -> array<double>: dequantize (q / 127.0). */
case class DequantizeExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.binary(child, prettyName)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dequantize_int8"

  override def nullSafeEval(q: Any): Any =
    new GenericArrayData(VectorKernels.dequantize(q.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.VectorKernels.dequantize($c))")

  override protected def withNewChildInternal(c: Expression): DequantizeExpr =
    copy(child = c)
}

/** array<float> -> double: L2 norm (double left-fold). */
case class L2NormExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(child, prettyName)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_norm"

  override def nullSafeEval(v: Any): Any =
    VectorKernels.l2norm(v.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.l2norm($c.toFloatArray())")

  override protected def withNewChildInternal(c: Expression): L2NormExpr =
    copy(child = c)
}

/** array<float> -> array<int>: sign-LSH bucket id per table, against a
  * plane matrix baked in as a literal reference object. One compiled pass
  * over the vector replaces `tables*bits` interpreted
  * aggregate(zip_with(...)) folds (each of which allocates a zipped struct
  * array per row); accumulation order is identical, so results are
  * bitwise-equal to the declarative form (asserted in SimdSpec). */
case class SignBucketsExpr(child: Expression, planes: Array[Double],
    tables: Int, bits: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(child, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_buckets"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorKernels.signBuckets(
      v.asInstanceOf[ArrayData].toFloatArray(), planes, tables, bits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("signPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.signBuckets($c.toFloatArray(), " +
        s"$planesRef, $tables, $bits))")
  }

  override protected def withNewChildInternal(c: Expression): SignBucketsExpr =
    copy(child = c)
}

/** array<float> -> array<int>: PQ code per subspace against a trained flat
  * codebook reference object (training/inspection form; storage uses
  * PqEncodeExpr's byte packing). One codegen'd pass assigns all m
  * subspaces. */
case class PqAssignExpr(child: Expression, codebook: Array[Double],
    m: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(child, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_assign"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorKernels.pqCodes(
      v.asInstanceOf[ArrayData].toFloatArray(), codebook, m, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.pqCodes($c.toFloatArray(), " +
        s"$cbRef, $m, $k))")
  }

  override protected def withNewChildInternal(c: Expression): PqAssignExpr =
    copy(child = c)
}

/** array<float> -> binary: PQ codes packed one byte per subspace — the
  * stored/compressed row form (m bytes vs dim*4 floats). */
case class PqEncodeExpr(child: Expression, codebook: Array[Double],
    m: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(child, prettyName)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any =
    VectorKernels.pqEncode(
      v.asInstanceOf[ArrayData].toFloatArray(), codebook, m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.pqEncode($c.toFloatArray(), " +
        s"$cbRef, $m, $k)")
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** array<float> (query) -> array<double>: the per-query ADC lookup table
  * (lut[sub*k+c] = <nq_sub, centroid_c>) — computed once per query row,
  * then every corpus row scores via PqAdcExpr with m table reads. */
case class PqLutExpr(child: Expression, codebook: Array[Double],
    m: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(child, prettyName)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorKernels.pqLut(
      v.asInstanceOf[ArrayData].toFloatArray(), codebook, m, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.pqLut($c.toFloatArray(), " +
        s"$cbRef, $m, $k))")
  }

  override protected def withNewChildInternal(c: Expression): PqLutExpr =
    copy(child = c)
}

/** binary (PQ codes) x array<double> (LUT) -> double: approximate cosine
  * via asymmetric distance computation — m byte reads + adds per row. */
case class PqAdcExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.both(VecTypeCheck.binary(left, prettyName),
      right.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double> LUT, got ${other.catalogString}")
      })
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.pqAdc(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[ArrayData].toDoubleArray(), k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.pqAdc($a, $b.toDoubleArray(), $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcExpr =
    copy(left = l, right = r)
}

/** array<float> -> array<float>: y = x . R for a baked-in row-major
  * dim x dim rotation (OPQ's learned orthogonal transform — see
  * VectorKernels.rotateFloat). Codegen'd so the rotate+encode pipeline
  * stays inside WholeStageCodegen. */
case class RotateMatExpr(child: Expression, rotation: Array[Double])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(child, prettyName)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rotate_mat"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorKernels.rotateFloat(
      v.asInstanceOf[ArrayData].toFloatArray(), rotation))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("rotation", rotation, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.rotateFloat($c.toFloatArray(), $rRef))")
  }

  override protected def withNewChildInternal(c: Expression): RotateMatExpr =
    copy(child = c)
}

/** array<float> -> array<double>: PQ reconstruction (decode of the
  * row's nearest codes) — the Procrustes correlation's right factor. */
case class PqReconstructExpr(child: Expression, codebook: Array[Double],
    m: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(child, prettyName)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_reconstruct"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorKernels.pqReconstruct(
      v.asInstanceOf[ArrayData].toFloatArray(), codebook, m, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.pqReconstruct($c.toFloatArray(), " +
        s"$cbRef, $m, $k))")
  }

  override protected def withNewChildInternal(c: Expression): PqReconstructExpr =
    copy(child = c)
}

/** array<float> -> double: squared PQ quantization error of the row
  * under a baked-in codebook — OPQ's training objective, aggregated to
  * compare rotations at equal budget. */
case class PqErrorExpr(child: Expression, codebook: Array[Double],
    m: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(child, prettyName)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_error"

  override def nullSafeEval(v: Any): Any =
    VectorKernels.pqError(
      v.asInstanceOf[ArrayData].toFloatArray(), codebook, m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.pqError($c.toFloatArray(), $cbRef, $m, $k)")
  }

  override protected def withNewChildInternal(c: Expression): PqErrorExpr =
    copy(child = c)
}
/** array<float> -> array<bigint>: packed sign bits (binary quantization).
  * One codegen'd pass replaces the interpreted transform/aggregate HOF
  * formulation; see VectorKernels.signPack for the bit layout. */
case class SignPackExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_pack"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorKernels.signPack(
      v.asInstanceOf[ArrayData].toFloatArray()))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.signPack($c.toFloatArray()))")

  override protected def withNewChildInternal(c: Expression): SignPackExpr =
    copy(child = c)
}

/** (array<bigint>, array<bigint>) -> bigint: Hamming distance between two
  * packed sign codes (codegen'd XOR+popcount loop). */
case class HammingExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def longArray(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> (packed sign code), got ${other.catalogString}")
    }
    VecTypeCheck.both(longArray(left), longArray(right))
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming_packed"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.hammingPacked(
      a.asInstanceOf[ArrayData].toLongArray(),
      b.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.hammingPacked($a.toLongArray(), $b.toLongArray())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingExpr =
    copy(left = newLeft, right = newRight)
}
