package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

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
  * Spark's own runtime filters (`InjectRuntimeFilter`) apply the same
  * idea automatically, but only within one query and under size
  * thresholds; this operator makes the technique explicit and lets the
  * key set come from anywhere (another query, a previous job's output).
  */
object BloomPrune {

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
    val bf = small.stat.bloomFilter(smallKey, expectedKeys, fpp)
    val bcast = big.sparkSession.sparkContext.broadcast(bf)
    val probe: Column = big.schema(bigKey).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        val f = udf((k: java.lang.Long) => k != null && bcast.value.mightContainLong(k))
        f(col(bigKey).cast("long"))
      case StringType =>
        val f = udf((k: String) => k != null && bcast.value.mightContainString(k))
        f(col(bigKey))
      case t => throw new IllegalArgumentException(s"bloom key type unsupported: $t")
    }
    big.filter(probe)
  }
}
