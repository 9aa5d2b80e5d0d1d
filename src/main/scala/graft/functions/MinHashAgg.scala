package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash signature aggregate: ONE aggregation state of
  * `a.length` longs, updated in a tight loop per (doc, shingle-hash)
  * row, instead of `numHashes` separate `min(...)` aggregate columns.
  *
  * Semantics are identical to the unfused form — element j of the
  * result is `min over rows of (h * a(j) + b(j)) mod p`, with `p`
  * ("inf") for groups the input never reaches — so the DuckDB oracle
  * twin is unchanged. What changes is cost: the planner sees a single
  * aggregate function rather than 64, the update loop is one virtual
  * call per row instead of 64 expression-tree evaluations, and the
  * shuffled partial state is one 64-long byte blob per (mapper, doc).
  * Partial aggregation (map-side combine) works as for any
  * TypedImperativeAggregate: update → serialize → shuffle → merge.
  *
  * Inputs are already reduced mod p and the multipliers are < p, so
  * `h * a(j) + b(j)` stays under 2^63 and plain `%` equals `pmod` —
  * no negative operands ever arise.
  */
case class MinHashSig(
    child: Expression,
    p: Long,
    a: Seq[Long],
    b: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override def createAggregationBuffer(): Array[Long] = Array.fill(a.length)(p)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < buf.length) {
        val m = (h * aArr(j) + bArr(j)) % p
        if (m < buf(j)) buf(j) = m
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < buf.length) {
      if (other(j) < buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashAgg {
  /** Column form: minhash signature (array of `a.length` longs) over a
    * LongType column of base shingle hashes in [0, p). */
  def minhashSig(h: Column, p: Long, a: Seq[Long], b: Seq[Long]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      MinHashSig(org.apache.spark.sql.GraftSqlBridge.expression(h), p, a, b).toAggregateExpression())
}
