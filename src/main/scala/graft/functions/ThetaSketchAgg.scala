package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Theta-sketch distinct-set aggregate: `theta_sketch(id)` returns the
  * COMPACT theta sketch (binary) of a group's long ids.
  *
  * Why theta beside the HLL tier (q_approx_distinct / q_hll_merge): HLL
  * answers |A| and |A ∪ B|; theta sketches retain a SAMPLE of the hashed
  * keys (the k smallest hashes under threshold theta), which is what makes
  * set INTERSECTION and difference estimable — "users who did A and B" is
  * not an HLL-expressible question. The retained set (and hence the compact
  * sketch, estimate and bounds) is a pure function of the input SET — the
  * k smallest of a set of hashes does not depend on arrival or merge order
  * — so results are deterministic across partitionings, unlike most
  * sampling.
  *
  * Scale shape: classic sketch partial aggregation — each partition folds
  * into a <= 8*2^lgK-byte union buffer, the shuffle ships one compact
  * sketch per (group x partition), merges are union operations. Serialized
  * form between partial and final IS the compact sketch (the union state
  * is exactly the surviving hash set + theta, so compact round-trips it
  * losslessly).
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch"

  private def newUnion(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): Union = newUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion()
    u.union(org.apache.datasketches.theta.Sketches.heapifyCompactSketch(
      Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

object ThetaSketchAgg {
  import org.apache.spark.sql.graft.bridge

  /** Column wrapper: theta sketch of a LongType column. */
  def thetaSketch(c: Column, lgK: Int = 12): Column =
    bridge.column(
      ThetaSketchAgg(bridge.expression(c), lgK).toAggregateExpression())
}
