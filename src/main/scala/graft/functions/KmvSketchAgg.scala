package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values distinct sketch as a mergeable
  * TypedImperativeAggregate — the per-group distinct-counting pass
  * that answers "how many distinct users per window" over a 100 TB
  * stream with `k` longs of state per group, where the exact
  * count-distinct shuffles one row per distinct member.
  *
  * The buffer holds the `k` smallest DISTINCT values of the child
  * hash column seen so far (the Bar-Yossef et al. KMV estimator's
  * working set). Update inserts a hash when it is new and smaller
  * than the current k-th minimum; merge is the set union re-trimmed
  * to the k smallest — both are order-insensitive, so unlike the
  * Misra–Gries counters ([[FreqSketch]]) the final state is
  * DETERMINISTIC given the input set, regardless of partitioning or
  * merge order. That determinism is why the full sketch → estimate
  * path can hash-match a DuckDB oracle (the q34 recipe: both engines
  * compute the same md5-derived minima), where HLL registers
  * (`approx_count_distinct` — engine-private) never can; the sketch
  * earns its place as a custom aggregate exactly because Spark lacks
  * a deterministic mergeable distinct summary.
  *
  * The child must be the 60-bit [[Hashing.md5Long]] of the member —
  * hashing stays OUTSIDE the aggregate so the caller's recipe (salt,
  * prefix) is visible to, and reproducible by, the oracle. Input
  * rows need not be pre-deduplicated: re-deliveries of the same
  * member hash identically and the set absorbs them, which is what
  * makes the sketch a DISTINCT summary. Distinct members colliding
  * to one hash merge into one sketch member (the standard KMV error
  * model absorbs this; at 60 bits it is never observed in practice).
  *
  * Estimate read-off (the caller's job, shared with
  * [[graft.operators.Packing.kmvDistinct]]): exact `n_kept` below
  * `k`, else `⌊(k−1)·2⁶⁰ / h_k⌋` where `h_k` is the stored maximum
  * (relative error ~1/√k). State is ≤ `k` longs per group — one
  * small blob per mapper through the shuffle (map-side combine), and
  * in a streaming windowed aggregation the serialized buffer IS the
  * state-store row, re-merged per micro-batch (the st07/st08
  * mechanism, distinct edition).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  require(k >= 2, "KMV needs k >= 2")

  // a non-integral child fails at ANALYSIS (the FreqSketch
  // convention), and int children widen as built-ins would
  override def inputTypes = Seq(LongType)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  override def update(
      buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf += h // TreeSet dedups re-deliveries
      else if (h < buf.last && !buf.contains(h)) {
        buf -= buf.last
        buf += h
      }
    }
    buf
  }

  override def merge(
      buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    buf ++= other
    while (buf.size > k) buf -= buf.last
    buf
  }

  /** Ascending array of the held minima (≤ k longs) — deterministic
    * given the input set, so queries may emit it (or the estimate
    * derived from it) raw across the oracle gate. */
  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => buf += bb.getLong)
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketchAgg {
  /** Column form: KMV k-minima of a LONG hash column; result is
    * array<long>, ascending, ≤ k members. Hash with
    * [[Hashing.md5Long]] before aggregating (see the class doc). */
  def kmvSketch(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      KmvSketch(org.apache.spark.sql.GraftSqlBridge.expression(c), k)
        .toAggregateExpression())
}
