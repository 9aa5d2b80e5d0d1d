package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a mergeable
  * TypedImperativeAggregate — the heavy-hitters pass that finds a
  * 100 TB corpus's dominant tokens in ONE linear scan with `capacity`
  * counters of state, where the exact groupBy shuffles one row per
  * distinct token.
  *
  * Update is classic Misra–Gries: increment a held counter, admit into
  * spare capacity, else decrement every counter (dropping zeros).
  * Merge is the mergeable-summaries reduction (Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS'12): sum the
  * two counter sets, then subtract the (capacity+1)-th largest counter
  * value from all and drop the non-positives. Both preserve the MG
  * guarantee over n total rows:
  *
  *   true_count − n/(capacity+1)  ≤  estimate  ≤  true_count
  *
  * and every item with true_count > n/(capacity+1) is present in the
  * final sketch — REGARDLESS of partitioning or merge order.
  *
  * The counter VALUES (not the guarantee) do depend on merge order,
  * which Spark does not fix across runs — so queries must emit the
  * CONTRACT (booleans derived from the guarantee, which hold under
  * every order), never the raw estimates; the t24 query is the
  * oracle-checked shape. State is `capacity` (token, count) pairs —
  * one small blob per mapper through the shuffle, the map-side-combine
  * property the exact aggregation lacks at corpus scale.
  */
case class FreqSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  require(capacity >= 1, "FreqSketch needs capacity >= 1")

  // a non-string child (easy to reach via the graft_freq_sketch SQL
  // surface) must fail at ANALYSIS, not as a runtime ClassCastException
  // in update(); implicit casts also let int/date children work as the
  // built-in string aggregates would. (Return type inferred:
  // AbstractDataType is private[sql] in Spark 4, so it can't be named
  // here — Seq covariance makes Seq[StringType.type] conform.)
  override def inputTypes = Seq(StringType)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      buf.get(t) match {
        case Some(c) => buf(t) = c + 1L
        case None if buf.size < capacity => buf(t) = 1L
        case None =>
          // decrement-all: one "vote" against every held counter
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1L
            if (c <= 0L) dead += k else buf(k) = c
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf(t) = buf.getOrElse(t, 0L) + c }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { k =>
        val c = buf(k) - m
        if (c <= 0L) dead += k else buf(k) = c
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Array of (token, est) structs, largest estimate first (ties by
    * token); deterministic given the counter set — see the class doc
    * for why only contract booleans derived from it should be emitted
    * by cross-engine-checked queries. */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val byteArrs = entries.map { case (t, _) => t.getBytes(UTF_8) }
    val size = 4 + byteArrs.map(b => 4 + b.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(byteArrs(i).length)
      bb.put(byteArrs(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf(new String(arr, UTF_8)) = bb.getLong
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType), StructField("est", LongType))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketch =
    copy(child = newChild)
}

object FreqSketchAgg {
  /** Column form: Misra–Gries sketch of a string column with `capacity`
    * counters; result is array<struct<token, est>>, largest first. */
  def freqSketch(c: Column, capacity: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      FreqSketch(org.apache.spark.sql.GraftSqlBridge.expression(c), capacity)
        .toAggregateExpression())
}
