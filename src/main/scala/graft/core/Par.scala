package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism hygiene for compute-bound per-row operators.
  *
  * A small parquet file arrives as ONE scan partition, which pins every
  * downstream per-row expression (sketches, shingles, bucket codes) to a
  * single task — the bench tables are exactly this shape. At 100 TB the
  * scan is already wider than the cluster and [[widen]] is a no-op; on a
  * narrow scan it inserts one round-robin shuffle of the raw rows, which
  * is negligible next to the sketch compute it unlocks.
  */
object Par {

  /** Repartition `df` to the session's default parallelism iff the
    * current plan has fewer partitions. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
