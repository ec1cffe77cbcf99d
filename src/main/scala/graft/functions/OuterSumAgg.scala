package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact outer-product sum for OPQ's Procrustes correlation:
  * `outer_sum_floor(x, y, dim)` accumulates floor(x_i * y_j * 2^43) as
  * LONGS into a dim x dim buffer — sum_rows floor-scaled(x . y^T), the
  * integer form of the decimal-routed correlation matrix (bit-identical
  * entries: floor before summation, exact integer adds, one final
  * long -> double conversion like DECIMAL(38,0) -> DOUBLE).
  *
  * Scale rationale: the naive formulation fans each row into dim^2
  * (i, j, x_i*y_j) rows through two chained posexplodes (4096 rows per
  * vector at dim 64) and shuffles them into a dim^2-key groupBy. This
  * aggregate keeps ONE dim^2 long buffer (32 KiB) per partition and
  * ships only those partials — the d x d matrix never exists as rows.
  * Overflow-safe by construction: |floor(x_i*y_j*2^43)| <= 2^43 with
  * |x_i|,|y_j| <= 1, so even 2^20 rows stay within 2^63.
  */
case class OuterSumAgg(
    xExpr: Expression,
    yExpr: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P43 = 8796093022208.0 // 2^43

  override def children: Seq[Expression] = Seq(xExpr, yExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "outer_sum_floor"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim * dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val xv = xExpr.eval(input)
    val yv = yExpr.eval(input)
    if (xv != null && yv != null) {
      val x = xv.asInstanceOf[ArrayData].toDoubleArray()
      val y = yv.asInstanceOf[ArrayData].toDoubleArray()
      require(x.length == dim && y.length == dim,
        s"outer_sum_floor expects dim $dim, got ${x.length} x ${y.length}")
      var i = 0
      while (i < dim) {
        val xi = x(i)
        val off = i * dim
        var j = 0
        while (j < dim) {
          buf(off + j) += math.floor(xi * y(j) * P43).toLong
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): OuterSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): OuterSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): OuterSumAgg =
    copy(xExpr = c(0), yExpr = c(1))
}
