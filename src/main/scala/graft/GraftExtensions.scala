package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration: exposes the vector kernels as SQL
  * functions, so `spark.sql("SELECT cosine_int8(...)")` works and the
  * engine surface is usable from pure SQL.
  *
  * Activate via:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * or config: spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("quantize_int8"),
      info("quantize_int8", "quantize_int8(array<float>) -> binary int8 vector"),
      (args: Seq[Expression]) => QuantizeInt8Expr(args.head)))
    e.injectFunction((FunctionIdentifier("cosine_int8"),
      info("cosine_int8", "cosine_int8(binary, binary) -> double cosine over int8 vectors"),
      (args: Seq[Expression]) => CosineInt8Expr(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("cosine_float"),
      info("cosine_float", "cosine_float(array<float>, array<float>) -> double"),
      (args: Seq[Expression]) => CosineFloatExpr(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("dequantize_int8"),
      info("dequantize_int8", "dequantize_int8(binary) -> array<double>"),
      (args: Seq[Expression]) => DequantizeExpr(args.head)))
    e.injectFunction((FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(array<float>) -> double"),
      (args: Seq[Expression]) => L2NormExpr(args.head)))
  }
}
