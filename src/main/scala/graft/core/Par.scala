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

  /** Repartition `df` to the session's default parallelism iff the scan
    * is estimated narrower than it.
    *
    * The estimate reads the ANALYZED plan's leaf statistics
    * (`sizeInBytes` / `spark.sql.files.maxPartitionBytes`, the same
    * arithmetic file splitting uses) instead of `df.rdd
    * .getNumPartitions` — materializing the RDD forces full physical
    * planning + codegen of the query twice (once here, once at
    * execution), which billed every sketch query a second planning pass.
    * Analysis is already done by the time a DataFrame exists, so the
    * stats read is free. The estimate ignores per-file packing
    * (`openCostInBytes`), which can only UNDER-estimate width and cause
    * a redundant repartition of an already-wide scan — a second shuffle,
    * never a lost one.
    */
  /** Evaluate `n` independent DataFrame builders concurrently and
    * return their results in index order — the guide-§2.6 "overlap
    * independent jobs" pattern for in-query compositions whose pieces
    * each run eager work (an eager [[Reliability.cut]], a scalar
    * fetch): submitted from one thread the jobs serialize, from a
    * small pool the scheduler back-fills each job's tail with the
    * next job's tasks. Builders MUST be independent (no shared mutable
    * state); Spark job submission is thread-safe. */
  def inParallel(n: Int)(build: Int => DataFrame): IndexedSeq[DataFrame] = {
    import scala.concurrent.{Await, ExecutionContextExecutorService, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    // a dedicated fixed pool sized n (r22, advice): the builders BLOCK
    // on Spark actions, and parking them on ExecutionContext.global
    // would eat the shared ForkJoinPool's parallelism for any nested or
    // wider use. The pool dies with this call; threads are daemons so
    // an abandoned builder can never pin the JVM.
    val pool: ExecutionContextExecutorService =
      ExecutionContext.fromExecutorService(
        java.util.concurrent.Executors.newFixedThreadPool(
          math.max(1, n),
          (r: Runnable) => { val t = new Thread(r, "graft-par"); t.setDaemon(true); t }))
    try {
      implicit val ec: ExecutionContext = pool
      val fs = (0 until n).map(i => Future(build(i)))
      fs.map(Await.result(_, Duration.Inf))
    } finally pool.shutdown()
  }

  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPartBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val estimated = df.queryExecution.analyzed.collectLeaves()
      .map(l => (l.stats.sizeInBytes / maxPartBytes).toLong + 1L)
      .sum
    if (estimated >= target) df else df.repartition(target)
  }
}
