package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance must equal from-scratch recompute — the
  * invariant that lets a rollup be trusted without ever auditing it
  * against history.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val spec = IncrementalAgg.Spec(
    keys = Seq("k"), sums = Seq("v"), mins = Seq("v"), maxs = Seq("v"))

  private def batch(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => (rnd.nextInt(5), rnd.nextInt(1000) - 500, rnd.nextDouble()))
      .toDF("k", "v", "noise")
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      s"state mismatch:\nA=${a.orderBy("k").collect().mkString("; ")}\nB=${b.orderBy("k").collect().mkString("; ")}")
  }

  test("sequential updates equal one partial over the union, bit-exact") {
    val dir = java.nio.file.Files.createTempDirectory("incagg").toString + "/state"
    val b1 = batch(1, 400); val b2 = batch(2, 300); val b3 = batch(3, 1)
    IncrementalAgg.update(spark, dir, b1, spec)
    IncrementalAgg.update(spark, dir, b2, spec)
    val got = IncrementalAgg.update(spark, dir, b3, spec)
    assertSame(got, IncrementalAgg.partial(b1.union(b2).union(b3), spec))
  }

  test("combine is order-insensitive (decimal sums, no double drift)") {
    val p1 = IncrementalAgg.partial(batch(4, 500), spec)
    val p2 = IncrementalAgg.partial(batch(5, 500), spec)
    assertSame(
      IncrementalAgg.combine(p1, p2, spec),
      IncrementalAgg.combine(p2, p1, spec))
  }

  test("state stays one row per key with the declared columns") {
    val dir = java.nio.file.Files.createTempDirectory("incagg").toString + "/state"
    IncrementalAgg.update(spark, dir, batch(6, 200), spec)
    val st = IncrementalAgg.update(spark, dir, batch(7, 200), spec)
    assert(st.columns.toSeq == spec.stateCols)
    assert(st.groupBy("k").count().filter($"count" > 1).count() === 0)
  }

  test("update shuffles state + batch keys, never history") {
    // structural form of the scale claim: the update plan reads only
    // the state parquet and the batch — there is no lineage back to
    // prior batches once the state is materialized
    val dir = java.nio.file.Files.createTempDirectory("incagg").toString + "/state"
    IncrementalAgg.update(spark, dir, batch(8, 100), spec)
    val plan = IncrementalAgg.combine(
      IncrementalAgg.read(spark, dir), IncrementalAgg.partial(batch(9, 100), spec), spec)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Relation") && plan.contains("parquet"))
  }
}
