package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The band-join optimizer rule: a non-equi time-range join that Spark
  * would execute as a nested-loop product must come out as a bucketed
  * equi join with identical results. */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def errors: DataFrame =
    Seq((1L, 10, 1000000L), (2L, 10, 5000000L), (3L, 11, 9000000L))
      .toDF("eid", "u", "us").select($"eid", $"u", timestamp_micros($"us").as("ts"))

  private def clicks: DataFrame =
    Seq((101L, 10, 400000L), (102L, 10, 4400000L), (103L, 10, 5000000L), (104L, 11, 8000000L),
      (105L, 12, 8000000L), (106L, 11, 12000000L))
      .toDF("cid", "cu", "cus").select($"cid", $"cu", timestamp_micros($"cus").as("cts"))

  // clicks within [ts - 1s, ts) of an error by the same user
  private def bandJoin(): DataFrame =
    errors.join(clicks,
      $"u" === $"cu" &&
        unix_micros($"cts") >= unix_micros($"ts") - 1000000L &&
        unix_micros($"cts") < unix_micros($"ts"))
      .select($"eid", $"cid")

  private def withRule[A](f: => A): A = {
    val saved = spark.experimental.extraOptimizations
    GraftExtensions.installRangeJoinRewrite(spark)
    try f finally spark.experimental.extraOptimizations = saved
  }

  test("baseline: without the rule a pure band join is a nested-loop product") {
    // (with an equi key Spark hash-joins on the key and evaluates the
    // range per same-key pair — no NLJ, but quadratic in any hot key;
    // with no key at all it nested-loops outright)
    val p = errors.join(clicks,
      unix_micros($"cts") >= unix_micros($"ts") - 1000000L &&
        unix_micros($"cts") < unix_micros($"ts"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"), p)
  }

  test("with the rule: equi join on buckets, identical rows") {
    val want = bandJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule {
      val df = bandJoin()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("__graft_bkt"), s"bucket key missing from plan:\n$p")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want)
      assert(got === Set((1L, 101L), (2L, 102L), (3L, 104L))) // half-open window, key-scoped
    }
  }

  test("fires on pure band joins with no equi key at all") {
    val want = errors.join(clicks,
      unix_micros($"cts") >= unix_micros($"ts") - 1000000L &&
        unix_micros($"cts") < unix_micros($"ts"))
      .select($"eid", $"cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule {
      val df = errors.join(clicks,
        unix_micros($"cts") >= unix_micros($"ts") - 1000000L &&
          unix_micros($"cts") < unix_micros($"ts"))
        .select($"eid", $"cid")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === want)
    }
  }

  test("applies through the SQL surface too") {
    errors.createOrReplaceTempView("rr_err")
    clicks.createOrReplaceTempView("rr_clk")
    withRule {
      val df = spark.sql(
        """SELECT eid, cid FROM rr_err JOIN rr_clk
          |ON u = cu AND unix_micros(cts) BETWEEN unix_micros(ts) - 1000000 AND unix_micros(ts) - 1
          |""".stripMargin)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((1L, 101L), (2L, 102L), (3L, 104L)))
    }
  }

  test("does not fire when only one bound exists") {
    withRule {
      val df = errors.join(clicks, $"u" === $"cu" && unix_micros($"cts") < unix_micros($"ts"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("__graft_bkt"), s"rule fired without both bounds:\n$p")
    }
  }
}
