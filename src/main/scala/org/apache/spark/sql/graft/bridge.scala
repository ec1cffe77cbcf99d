package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. `ExpressionUtils` is
  * `private[sql]`, so this lives under org.apache.spark.sql — the standard
  * technique for Spark extension libraries that supply custom Expressions
  * (same access pattern the built-in connectors use). */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime twin of graft.GraftExtensions: registers the vector SQL
    * functions into an ALREADY-RUNNING session (extensions can only be
    * injected at builder time). Idempotent. */
  def registerVectorFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.functions._
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("quantize_int8",
      exprs => QuantizeInt8Expr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_int8",
      exprs => CosineInt8Expr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_float",
      exprs => CosineFloatExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dequantize_int8",
      exprs => DequantizeExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("l2_norm",
      exprs => L2NormExpr(exprs.head), "scala_udf")
  }
}
