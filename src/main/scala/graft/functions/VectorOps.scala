package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Column-level vector API backed by codegen'd Catalyst Expressions
  * (VectorExpressions.scala) — stays inside WholeStageCodegen, unlike UDFs.
  *
  * Storage layout decision (SURVEY.md §1.3): quantized vectors are packed
  * `BinaryType` (one byte per int8 component) rather than `array<byte>` —
  * 1 byte/component on the wire and in parquet, the Spark analog of the
  * reference's dense int8 matrix (pythonvectordb.py:225).
  */
object VectorOps {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    bridge.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    bridge.expression(col)

  /** array<float> -> binary (int8-quantized, unit-normalized * 127, trunc). */
  def quantizeInt8(v: Column): Column = c(QuantizeInt8Expr(e(v)))

  /** binary x binary -> double cosine score in [-1, 1]; 0.0 on zero norm. */
  def cosineInt8(a: Column, b: Column): Column = c(CosineInt8Expr(e(a), e(b)))

  /** array<float> x array<float> -> double cosine score. */
  def cosineFloat(a: Column, b: Column): Column = c(CosineFloatExpr(e(a), e(b)))

  /** binary x binary -> bigint exact int8 inner product (MIPS metric). */
  def dotInt8(a: Column, b: Column): Column = c(DotInt8Expr(e(a), e(b)))

  /** array<float> x array<float> -> double euclidean distance (L2). */
  def l2Float(a: Column, b: Column): Column = c(L2FloatExpr(e(a), e(b)))

  /** binary (stored qvec) x array<float> (raw query) -> double cosine of the
    * float query vs the dequantized stored vector — the reference's search
    * scoring (only the stored side quantized, pythonvectordb.py:25-67). */
  def cosineFloatInt8(qvec: Column, query: Column): Column =
    c(CosineFloatInt8Expr(e(qvec), e(query)))

  /** binary -> array<double> (q / 127.0). */
  def dequantize(q: Column): Column = c(DequantizeExpr(e(q)))

  /** array<float> -> double L2 norm. */
  def l2norm(v: Column): Column = c(L2NormExpr(e(v)))

  /** array<float> -> double: max abs per-component int8 quantization
    * error of the row (zero-norm guard -> 0.0). */
  def quantErrRow(v: Column): Column = c(QuantErrRowExpr(e(v)))

  /** array<float> -> array<int>: sign-LSH bucket per table against a
    * flattened [(t*bits+j)*dim+i] plane matrix (one codegen'd pass). */
  def signBuckets(v: Column, planes: Array[Double], tables: Int, bits: Int): Column =
    c(SignBucketsExpr(e(v), planes, tables, bits))

  /** array<float> -> array<double>: unit L2 normalization with the
    * reference's < 1e-10 zero-norm guard (pythonvectordb.py:70-99) —
    * pure Catalyst composition (codegen'd HOF, no UDF). */
  def normalize(v: Column): Column = {
    val nrm = l2norm(v)
    when(nrm < lit(VectorKernels.ZeroNormEps),
      transform(v, _ => lit(0.0)))
      .otherwise(transform(v, x => x.cast("double") / nrm))
  }

  /** array<float> -> array<int>: PQ subspace codes against a trained flat
    * codebook (layout [(sub*k+c)*subdim+i]) — training/inspection form. */
  def pqAssign(v: Column, codebook: Array[Double], m: Int, k: Int): Column =
    c(PqAssignExpr(e(v), codebook, m, k))

  /** array<float> -> binary: PQ codes, one byte per subspace (the stored
    * compressed row — m bytes vs dim*4 floats). */
  def pqEncode(v: Column, codebook: Array[Double], m: Int, k: Int): Column =
    c(PqEncodeExpr(e(v), codebook, m, k))

  /** array<float> query -> array<double> ADC lookup table (m*k dots). */
  def pqLut(q: Column, codebook: Array[Double], m: Int, k: Int): Column =
    c(PqLutExpr(e(q), codebook, m, k))

  /** binary codes x array<double> lut -> double approximate cosine. */
  def pqAdc(codes: Column, lut: Column, k: Int): Column =
    c(PqAdcExpr(e(codes), e(lut), k))

  /** array<float> -> array<float>: y = x . R for a row-major dim x dim
    * rotation (OPQ's learned orthogonal transform). */
  def rotateMat(v: Column, rotation: Array[Double]): Column =
    c(RotateMatExpr(e(v), rotation))

  /** array<float> -> array<double>: PQ reconstruction (decoded codes). */
  def pqReconstruct(v: Column, codebook: Array[Double], m: Int, k: Int): Column =
    c(PqReconstructExpr(e(v), codebook, m, k))

  /** array<float> -> double: squared PQ quantization error of the row. */
  def pqError(v: Column, codebook: Array[Double], m: Int, k: Int): Column =
    c(PqErrorExpr(e(v), codebook, m, k))

  /** Exact dim x dim outer-product-sum aggregate (floor-scaled longs) —
    * OPQ's Procrustes correlation in one bounded buffer per partition. */
  def outerSumFloor(x: Column, y: Column, dim: Int): Column =
    c(OuterSumAgg(e(x), e(y), dim).toAggregateExpression())

  /** One Lloyd's iteration's (sums, counts) sufficient statistics in one
    * bounded buffer per partition — PQ training without the per-iteration
    * posexplode shuffle. */
  def kmeansSumFloor(v: Column, codebook: Array[Double], m: Int, k: Int): Column =
    c(KMeansSumAgg(e(v), codebook, m, k).toAggregateExpression())

  /** Bounded top-k aggregate: array<struct<vec_id,score>> of the k best
    * (score DESC, id ASC) pairs per group; partial-aggregates map-side so a
    * batched kNN shuffles only k rows per (group x partition). */
  def topK(score: Column, id: Column, k: Int): Column =
    c(TopKAgg(e(score), e(id), k).toAggregateExpression())

  /** Non-finite component check as a pure Catalyst predicate (codegen'd, no
    * UDF): true if any element is NaN or +/-Inf. */
  def hasNonFinite(v: Column): Column =
    exists(v, x => isnan(x) || abs(x) === lit(Float.PositiveInfinity))

  /** Binary quantization: packed sign bits, array<bigint> of ceil(dim/64). */
  def signPack(v: Column): Column = c(SignPackExpr(e(v)))

  /** Hamming distance between two packed sign codes. */
  def hamming(a: Column, b: Column): Column = c(HammingExpr(e(a), e(b)))
}
