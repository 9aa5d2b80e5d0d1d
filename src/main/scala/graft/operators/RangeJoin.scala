package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join: pair every left row with the right
  * rows of the same key whose time falls in
  * `[leftTime - before, leftTime + after)`.
  *
  * The naive form is a non-equi theta join — Spark executes that as a
  * broadcast-nested-loop or cartesian product, which is quadratic and
  * unusable at scale. The scale path re-expresses the range predicate as
  * an EQUI join on a coarse time bucket: with bucket width
  * `W = before + after`, any right row inside a left row's window lies
  * in one of (at most) two consecutive buckets, so the left side
  * explodes to its ≤ 2 candidate buckets, equi-joins on (key, bucket) —
  * shuffle-hash / sort-merge, partition-parallel — and the exact range
  * predicate filters the candidates. Each right row carries exactly one
  * bucket, so a matched pair is produced exactly once (no post-dedup).
  *
  * This is the batch twin of the stream-stream interval join
  * (`graft.streaming.EventStream` st04) and the standard bucketing
  * rewrite for time-series joins on MPP engines.
  */
object RangeJoin {

  /** Inner bucketed range join. Output: all left columns plus `right`'s
    * non-key columns (names must not collide — rename before joining).
    * `before`/`after` are in the unit of the micro-second epoch times,
    * i.e. microseconds.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      beforeUs: Long,
      afterUs: Long): DataFrame = {
    require(beforeUs + afterUs > 0, "window must have positive width")
    val w = beforeUs + afterUs
    val clash = left.columns.filterNot(keys.contains)
      .intersect(right.columns.filterNot(keys.contains))
    require(clash.isEmpty, s"range-join payload name clash: ${clash.mkString(", ")}")

    val lUs = unix_micros(col(leftTime))
    val rUs = unix_micros(col(rightTime))
    // Exact floorDiv: `floor(us / W)` in double math mis-buckets values
    // within ~200 µs of a day-bucket boundary (the quotient rounds up
    // across the integer), so subtract the positive modulus first — the
    // difference is an exact multiple of W and divides exactly.
    def bucket(us: org.apache.spark.sql.Column) =
      ((us - pmod(us, lit(w))) / lit(w)).cast("long")

    val lExp = left
      .withColumn("__bkt", explode(array_distinct(array(
        bucket(lUs - beforeUs), bucket(lUs + afterUs - 1)))))
      .withColumn("__lus", lUs)
    val rTag = right.withColumn("__bkt", bucket(rUs)).withColumn("__rus", rUs)

    lExp.join(rTag,
        keys :+ "__bkt",
        "inner")
      .filter(col("__rus") >= col("__lus") - beforeUs && col("__rus") < col("__lus") + afterUs)
      .drop("__bkt", "__lus", "__rus")
  }
}
