package graft.functions

import java.io.ByteArrayInputStream
import java.util.WeakHashMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
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
  * executor so tasks share one in-memory filter. The deserialized
  * filter is additionally cached in a per-task `@transient lazy val`,
  * so the per-row cost is one field read + bit test — the shared memo
  * is consulted once per task, not once per row.
  */
case class BloomProbe(bloom: Broadcast[Array[Byte]], child: Expression)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_probe expects a LongType key hash, got ${child.dataType.catalogString}")

  override def prettyName: String = "graft_bloom_probe"

  // The expression instance is deserialized once per task; the first
  // probe resolves the filter through the executor-wide memo and every
  // subsequent row reads this field.
  @transient private lazy val filter: BloomFilter = BloomProbe.filterFor(bloom)

  def probe(h: Long): Boolean = filter.mightContainLong(h)

  override def nullSafeEval(h: Any): Any = probe(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomProbe", this, classOf[BloomProbe].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  // One deserialization per executor per live filter. Keyed WEAKLY by
  // the broadcast's VALUE (the byte array), not the Broadcast wrapper:
  // the wrapper is deserialized fresh for every task, so a
  // wrapper-keyed map never hits across tasks and the tens-of-MB
  // filter would be re-`readFrom`'d per TASK — a cluster-wide latency
  // tax at 100 TB. `b.value` is served from the executor's block
  // manager and is identity-stable for every task on the executor
  // (Array does not override equals, so WeakHashMap keys on identity);
  // a restarted SparkContext that reuses broadcast ids yields a
  // different array instance, so a stale filter can never be served,
  // and entries vanish when the block manager drops the broadcast
  // block instead of a racy size-triggered clear() that could evict
  // in-use filters mid-query.
  private val cache = new WeakHashMap[Array[Byte], BloomFilter]()
  private[functions] def filterFor(b: Broadcast[Array[Byte]]): BloomFilter = {
    val bytes = b.value
    cache.synchronized {
      var f = cache.get(bytes)
      if (f == null) {
        f = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
        cache.put(bytes, f)
      }
      f
    }
  }
}
