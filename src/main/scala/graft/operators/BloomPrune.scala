package graft.operators

import graft.functions.BloomProbe
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Bloom-filter join pruning: drop big-side rows that cannot possibly
  * join BEFORE they reach the shuffle.
  *
  * The regime: the join side carrying the keys (a filtered dimension, a
  * key set from another pipeline stage) is too large to broadcast as a
  * hash table — tens of millions of keys — but its Bloom filter is a
  * few tens of MB. Building the filter is one map-side-combinable
  * aggregate over the key side; probing is a per-row bit test on the
  * fact side, so the shuffle moves only probable matches. False
  * positives (rate `fpp`) just let a few extra rows into the exact join
  * that follows; false negatives cannot occur, so results are exact.
  *
  * Implementation: built with the same codegen'd `BloomFilterAggregate`
  * Spark's own runtime filters (`InjectRuntimeFilter`) use, driven
  * explicitly so the key set can come from anywhere (another query, a
  * previous job's output) rather than only from within one optimized
  * query. The probe side diverges from Spark's `BloomFilterMightContain`
  * deliberately: that expression carries the serialized filter as a plan
  * `Literal`, which rides every task's serialized binary — fine at KB
  * sizes, wrong at this operator's tens-of-MB regime. The filter ships
  * as a [[org.apache.spark.broadcast.Broadcast]] instead, probed by the
  * codegen'd [[graft.functions.BloomProbe]] (one torrent-broadcast fetch
  * + one deserialization per executor). Both sides hash through the same
  * codegen'd `xxhash64`, so the probe stays inside whole-stage codegen
  * (a Scala UDF here would pay per-row serialization on the hot scan).
  */
object BloomPrune {

  private def supported(t: DataType): Boolean = t match {
    case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.BinaryType |
        org.apache.spark.sql.types.BooleanType | org.apache.spark.sql.types.DateType |
        org.apache.spark.sql.types.TimestampType => true
    case _: org.apache.spark.sql.types.NumericType => true
    case _ => false
  }

  /** `big` filtered to rows whose `bigKey` is (probably) present in
    * `small`'s `smallKey` set. `expectedKeys` sizes the filter —
    * overestimate rather than under (an undersized filter degrades
    * `fpp`, never correctness). Null keys never join and are dropped. */
  def semiFilter(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1, "expectedKeys > 0, fpp in (0,1)")
    Seq(big.schema(bigKey), small.schema(smallKey)).foreach { f =>
      if (!supported(f.dataType))
        throw new IllegalArgumentException(s"bloom key type unsupported: ${f.dataType}")
    }
    // optimal bit count for the target false-positive rate
    val numBits = math.ceil(-expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val buildHash = new XxHash64(Seq(GraftSqlBridge.expression(small(smallKey))))
    val agg = new BloomFilterAggregate(buildHash, Literal(expectedKeys), Literal(numBits))
    val bloomBytes = small
      .select(GraftSqlBridge.column(agg.toAggregateExpression()))
      .head().getAs[Array[Byte]](0)
    if (bloomBytes == null) return big.filter(lit(false)) // empty key side: nothing joins
    val bc = big.sparkSession.sparkContext.broadcast(bloomBytes)
    val probe = BloomProbe(bc, new XxHash64(Seq(GraftSqlBridge.expression(big(bigKey)))))
    // xxhash64(null) degenerates to the seed, so nulls must be excluded
    // explicitly — they never equi-join anyway
    big.filter(col(bigKey).isNotNull && GraftSqlBridge.column(probe))
  }
}
