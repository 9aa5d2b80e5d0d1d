package graft.functions

import java.io.ByteArrayInputStream
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, LongType}
import org.apache.spark.sql.types.AbstractDataType
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter probe over a BROADCAST filter.
  *
  * Spark's own `BloomFilterMightContain` takes the serialized filter as
  * a plan expression (`Literal` or scalar subquery), which rides every
  * task's serialized binary — fine for the KB-sized filters its runtime
  * filters build, wrong for [[graft.operators.BloomPrune]]'s stated
  * regime (tens of millions of keys → tens of MB of filter). Here the
  * bytes live in a [[Broadcast]]: the expression serializes as a
  * broadcast HANDLE, executors fetch the bytes once via torrent
  * broadcast, and [[BloomProbe.filterFor]] memoizes deserialization per
  * executor (keyed by broadcast id) so tasks share one in-memory filter.
  *
  * `child` is the 64-bit hash of the probe key (the caller hashes with
  * the same `xxhash64` used to build the filter, exactly like Spark's
  * build/probe pair), so the generated code is one virtual call + bit
  * test per row, inside whole-stage codegen.
  */
case class BloomProbe(bloom: Broadcast[Array[Byte]], child: Expression)
    extends UnaryExpression with Predicate with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def prettyName: String = "graft_bloom_probe"

  def probe(h: Long): Boolean = BloomProbe.filterFor(bloom).mightContainLong(h)

  override def nullSafeEval(h: Any): Any = probe(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomProbe", this, classOf[BloomProbe].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  // One deserialization per executor per filter (keyed by broadcast id)
  // instead of one per task. Bounded: a long-lived executor running many
  // distinct pruned queries clears the memo rather than growing it.
  private val cache = new ConcurrentHashMap[Long, BloomFilter]()
  private[functions] def filterFor(b: Broadcast[Array[Byte]]): BloomFilter = {
    if (cache.size > 64) cache.clear()
    cache.computeIfAbsent(b.id, _ => BloomFilter.readFrom(new ByteArrayInputStream(b.value)))
  }
}
