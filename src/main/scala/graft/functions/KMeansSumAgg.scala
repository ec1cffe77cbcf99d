package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One Lloyd's iteration's sufficient statistics for PQ training, in one
  * bounded buffer: `kmeans_sum_floor(v, codebook, m, k)` assigns each
  * row's normalized subvectors to their nearest centroids (the codegen'd
  * pqCodes kernel) and accumulates
  *   sums[(sub*k + c)*subdim + i] += floor(nv[sub*subdim+i] * 2^43)
  *   counts[sub*k + c]            += 1
  * as LONGS — bit-identical to the posexplode + groupBy((sub, c, i))
  * decimal-routed formulation (floor before sum, exact integer adds,
  * same long -> double -> /2^43 -> /count division order), asserted in
  * PqSpec.
  *
  * Scale rationale: the explode formulation fans dim rows per vector
  * into an m*k*subdim-key shuffle EVERY iteration. This aggregate keeps
  * one (m*k*subdim + m*k)-long buffer (~18 KiB at the testdata's shape)
  * per partition and ships only those partials — per iteration, the
  * shuffle is partitions x 18 KiB regardless of sample size.
  */
case class KMeansSumAgg(
    vExpr: Expression,
    codebook: Array[Double],
    m: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P43 = 8796093022208.0 // 2^43

  override def children: Seq[Expression] = Seq(vExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmeans_sum_floor"

  private def subdim: Int = codebook.length / (m * k)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](m * k * subdim + m * k)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val vv = vExpr.eval(input)
    if (vv != null) {
      val v = vv.asInstanceOf[ArrayData].toFloatArray()
      val nv = VectorKernels.normalizeD(v)
      val codes = VectorKernels.pqCodes(v, codebook, m, k)
      val sd = subdim
      var sub = 0
      while (sub < m) {
        val c = codes(sub)
        val off = (sub * k + c) * sd
        var i = 0
        while (i < sd) {
          buf(off + i) += math.floor(nv(sub * sd + i) * P43).toLong
          i += 1
        }
        buf(m * k * sd + sub * k + c) += 1L
        sub += 1
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

  override def withNewMutableAggBufferOffset(o: Int): KMeansSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMeansSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KMeansSumAgg =
    copy(vExpr = c(0))
}
