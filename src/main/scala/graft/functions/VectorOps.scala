package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector API (v1: deterministic Scala UDFs over the
  * VectorKernels; v2 will swap the internals for codegen'd Catalyst
  * Expressions without changing this surface).
  *
  * Storage layout decision (SURVEY.md §1.3): quantized vectors are packed
  * `BinaryType` (one byte per int8 component) rather than `array<byte>` —
  * 1 byte/component on the wire and in parquet, the Spark analog of the
  * reference's dense int8 matrix (pythonvectordb.py:225).
  */
object VectorOps {

  private val quantizeUdf = udf(VectorKernels.quantize _)
  private val cosineInt8Udf = udf(VectorKernels.cosineInt8 _)
  private val cosineFloatUdf = udf(VectorKernels.cosineFloat _)
  private val dequantizeUdf = udf(VectorKernels.dequantize _)
  private val l2normUdf = udf(VectorKernels.l2norm _)

  /** array<float> -> binary (int8-quantized, unit-normalized * 127, trunc). */
  def quantizeInt8(v: Column): Column = quantizeUdf(v)

  /** binary x binary -> double cosine score in [-1, 1]; 0.0 on zero norm. */
  def cosineInt8(a: Column, b: Column): Column = cosineInt8Udf(a, b)

  /** array<float> x array<float> -> double cosine score. */
  def cosineFloat(a: Column, b: Column): Column = cosineFloatUdf(a, b)

  /** binary -> array<double> (q / 127.0). */
  def dequantize(q: Column): Column = dequantizeUdf(q)

  /** array<float> -> double L2 norm. */
  def l2norm(v: Column): Column = l2normUdf(v)

  /** Non-finite component check as a pure Catalyst predicate (codegen'd, no
    * UDF): true if any element is NaN or +/-Inf. */
  def hasNonFinite(v: Column): Column =
    exists(v, x => isnan(x) || abs(x) === lit(Float.PositiveInfinity))
}
