package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused SimHash aggregate: ONE state of `bits` signed counters updated
  * per (doc, token-hash) row, evaluating directly to the packed
  * simhash. Replaces `bits` (60) separate `sum(when(bit set, 1, -1))`
  * aggregate columns plus the 60-term bit-packing projection: same
  * result (bit i set iff the ±1 counter sum is positive), but the
  * planner carries one aggregate function, the update is one loop per
  * row, and the shuffled partial state is one 60-long blob per
  * (mapper, doc). Map-side combine works as for any
  * TypedImperativeAggregate.
  */
case class SimHashSig(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        buf(i) += (if (((h >> i) & 1L) == 1L) 1L else -1L)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var code = 0L
    var i = 0
    while (i < bits) {
      if (buf(i) > 0) code |= (1L << i)
      i += 1
    }
    code
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashAgg {
  /** Column form: packed simhash (LongType) over a LongType column of
    * per-token hashes. */
  def simhashSig(h: Column, bits: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SimHashSig(org.apache.spark.sql.GraftSqlBridge.expression(h), bits).toAggregateExpression())
}
