package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** bigint x bigint -> bigint: Morton/z-order bit interleave of the two
  * grid coordinates (codegen'd — stays inside WholeStageCodegen like the
  * rest of the expression tier; see LayoutKernels.interleave2).
  */
case class ZOrder2Expr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint) inputs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder2"

  override def nullSafeEval(x: Any, y: Any): Any =
    LayoutKernels.interleave2(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.LayoutKernels.interleave2($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZOrder2Expr =
    copy(left = l, right = r)
}

/** Column-level wrapper (house pattern, see VectorOps). */
object LayoutOps {
  def zorder2(x: Column, y: Column, bits: Int): Column =
    bridge.column(ZOrder2Expr(bridge.expression(x), bridge.expression(y), bits))
}
