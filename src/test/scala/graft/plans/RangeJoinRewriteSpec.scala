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

  /** Install the rule with the size guard pinned for tiny test frames.
    * Every fixture here is bytes-small, so at the default threshold the
    * guard (correctly) declines in favor of a stock broadcast join —
    * the same reason Verify/Bench lower the knob for sf0.1. Confs are
    * restored after, the session being shared across suites. */
  private def withRuleConf[A](bytes: String, rows: String)(f: => A): A = {
    val saved = spark.experimental.extraOptimizations
    val keys = Seq(RangeJoinRewrite.SmallRightBytesKey -> bytes,
      RangeJoinRewrite.SmallRightRowsKey -> rows)
    val savedConf = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => if (v != null) spark.conf.set(k, v) else spark.conf.unset(k) }
    GraftExtensions.installRangeJoinRewrite(spark)
    try f finally {
      spark.experimental.extraOptimizations = saved
      savedConf.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  private def withRule[A](f: => A): A = withRuleConf("-1", null)(f)

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

  // --- size guard ---

  test("size guard: declines a genuinely small right side (broadcast wins)") {
    // both halves at their defaults: a 6-row, few-hundred-byte right is
    // bytes-small and rows-small, so the stock broadcast plan stands
    withRuleConf(null, null) {
      val df = bandJoin()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("__graft_bkt"), s"rule fired despite a broadcastable right side:\n$p")
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((1L, 101L), (2L, 102L), (3L, 104L)))
    }
  }

  test("size guard: a byte-small but row-heavy right side still rewrites") {
    // bytes half passes (1 GB threshold), but with the row ceiling at 3
    // the 6-row right counts as row-heavy — the BNLJ-killer must fire
    withRuleConf((1L << 30).toString, "3") {
      val df = bandJoin()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("__graft_bkt"), s"row-heavy right side was left to nested-loop:\n$p")
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((1L, 101L), (2L, 102L), (3L, 104L)))
    }
  }

  test("size guard: malformed conf values fall back instead of failing the query") {
    withRuleConf("not-a-number", "also-bad") {
      // defaults apply → small right declines; the query must still run
      val df = bandJoin()
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

  // --- typed bounds: the comparison space mapped to Long per type family ---

  test("fires on raw timestamp comparisons with INTERVAL arithmetic") {
    def q() = errors.join(clicks,
      $"u" === $"cu" &&
        $"cts" >= $"ts" - expr("INTERVAL 1 SECOND") &&
        $"cts" < $"ts")
      .select($"eid", $"cid")
    val want = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule {
      val df = q()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("__graft_bkt"), s"bucket key missing from plan:\n$p")
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === want)
      assert(want === Set((1L, 101L), (2L, 102L), (3L, 104L)))
    }
  }

  test("fires on integer-typed bounds") {
    val l = Seq((1L, 100), (2L, 500), (3L, 900)).toDF("lid", "lx")
    val r = Seq((11L, 120), (12L, 480), (13L, 485), (14L, 2000)).toDF("rid", "rx")
    def q() = l.join(r, $"rx" >= $"lx" - 30 && $"rx" <= $"lx" + 25).select($"lid", $"rid")
    val want = q().collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    withRule {
      val df = q()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet === want)
      assert(want === Set((1L, 11L), (2L, 12L), (2L, 13L)))
    }
  }

  test("fires on date-typed bounds via date_add/date_sub") {
    val l = Seq((1L, "2024-01-10"), (2L, "2024-03-01")).toDF("lid", "ld")
      .select($"lid", to_date($"ld").as("ld"))
    val r = Seq((11L, "2024-01-08"), (12L, "2024-01-20"), (13L, "2024-03-03")).toDF("rid", "rd")
      .select($"rid", to_date($"rd").as("rd"))
    def q() = l.join(r, $"rd" >= date_sub($"ld", 3) && $"rd" <= date_add($"ld", 4)).select($"lid", $"rid")
    val want = q().collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    withRule {
      val df = q()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet === want)
      assert(want === Set((1L, 11L), (2L, 13L)))
    }
  }

  // --- left outer ---

  private def outerBand(l: DataFrame): DataFrame =
    l.join(clicks,
      $"u" === $"cu" &&
        unix_micros($"cts") >= unix_micros($"ts") - 1000000L &&
        unix_micros($"cts") < unix_micros($"ts"),
      "left_outer")
      .select($"eid", $"cid")

  test("left outer: matched rows plus exactly one null row per unmatched left row") {
    // eid=4 (user 99) never matches; duplicate it to prove multiplicity
    val extra = Seq((4L, 99, 7000000L), (4L, 99, 7000000L))
      .toDF("eid", "u", "us").select($"eid", $"u", timestamp_micros($"us").as("ts"))
    val l = errors.unionByName(extra)
    val want = outerBand(l).collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    withRule {
      val df = outerBand(l)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("__graft_bkt"), s"bucket key missing from plan:\n$p")
      val got = df.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got === want)
      // the two copies of eid=4 each yield their own null row
      assert(got((4L, -1L)) === 2)
      assert(got((1L, 101L)) === 1)
    }
  }

  test("left outer: null left time yields a null row, not a dropped row") {
    val withNull = errors.unionByName(
      Seq((9L, 10)).toDF("eid", "u").select($"eid", $"u", lit(null).cast("timestamp").as("ts")))
    val want = outerBand(withNull).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    withRule {
      val got = outerBand(withNull).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got === want)
      assert(got.contains((9L, -1L)))
    }
  }

  // --- full outer ---

  private def fullBand(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r,
      $"u" === $"cu" &&
        unix_micros($"cts") >= unix_micros($"ts") - 1000000L &&
        unix_micros($"cts") < unix_micros($"ts"),
      "full_outer")
      .select($"eid", $"cid")

  private def pairCounts(df: DataFrame): Map[(Long, Long), Int] =
    df.collect().map(r => (
      if (r.isNullAt(0)) -1L else r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap

  test("full outer: matched, one null per unmatched left, one null-left per unmatched right") {
    // eid=4 (user 99) never matches — duplicated to prove multiplicity;
    // cids 103/105/106 match nothing and must each surface once with a
    // null left side
    val extra = Seq((4L, 99, 7000000L), (4L, 99, 7000000L))
      .toDF("eid", "u", "us").select($"eid", $"u", timestamp_micros($"us").as("ts"))
    val l = errors.unionByName(extra)
    val want = pairCounts(fullBand(l, clicks))
    withRule {
      val df = fullBand(l, clicks)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("__graft_bkt"), s"bucket key missing from plan:\n$p")
      val got = pairCounts(df)
      assert(got === want)
      assert(got((4L, -1L)) === 2) // both copies of the unmatched left row
      assert(got((-1L, 103L)) === 1 && got((-1L, 105L)) === 1 && got((-1L, 106L)) === 1)
      assert(got((1L, 101L)) === 1 && got((2L, 102L)) === 1 && got((3L, 104L)) === 1)
    }
  }

  test("full outer: null times on either side become null rows, not dropped rows") {
    val lNull = errors.unionByName(
      Seq((9L, 10)).toDF("eid", "u").select($"eid", $"u", lit(null).cast("timestamp").as("ts")))
    val rNull = clicks.unionByName(
      Seq((109L, 10)).toDF("cid", "cu").select($"cid", $"cu", lit(null).cast("timestamp").as("cts")))
    val want = pairCounts(fullBand(lNull, rNull))
    withRule {
      val got = pairCounts(fullBand(lNull, rNull))
      assert(got === want)
      assert(got.contains((9L, -1L)) && got.contains((-1L, 109L)))
    }
  }

  // --- right outer ---

  private def rightBand(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r,
      $"u" === $"cu" &&
        unix_micros($"cts") >= unix_micros($"ts") - 1000000L &&
        unix_micros($"cts") < unix_micros($"ts"),
      "right_outer")
      .select($"eid", $"cid")

  test("right outer: matched rows plus exactly one null-left row per unmatched right row") {
    // cid=107 (user 99) never matches; duplicate it to prove multiplicity
    val extra = Seq((107L, 99, 7000000L), (107L, 99, 7000000L))
      .toDF("cid", "cu", "cus").select($"cid", $"cu", timestamp_micros($"cus").as("cts"))
    val r = clicks.unionByName(extra)
    val want = pairCounts(rightBand(errors, r))
    withRule {
      val df = rightBand(errors, r)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("__graft_bkt"), s"bucket key missing from plan:\n$p")
      val got = pairCounts(df)
      assert(got === want)
      // both copies of the unmatched right row get their own null-left row
      assert(got((-1L, 107L)) === 2)
      assert(got((-1L, 103L)) === 1 && got((-1L, 105L)) === 1 && got((-1L, 106L)) === 1)
      assert(got((1L, 101L)) === 1 && got((2L, 102L)) === 1 && got((3L, 104L)) === 1)
    }
  }

  test("right outer: null right time yields a null-left row, not a dropped row") {
    val rNull = clicks.unionByName(
      Seq((109L, 10)).toDF("cid", "cu").select($"cid", $"cu", lit(null).cast("timestamp").as("cts")))
    val want = pairCounts(rightBand(errors, rNull))
    withRule {
      val got = pairCounts(rightBand(errors, rNull))
      assert(got === want)
      assert(got.contains((-1L, 109L)))
    }
  }

  test("right outer size guard: checks the LEFT side (the only stock-broadcastable one)") {
    // bytes half passes (1 GB); LEFT row ceiling 3 declines nothing
    // here because errors has exactly 3 rows → rule declines; ceiling 2
    // makes the left row-heavy → rule must fire. A small RIGHT side
    // must NOT suppress the rewrite for right outer.
    withRuleConf((1L << 30).toString, "2") {
      val df = rightBand(errors, clicks)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("__graft_bkt"), s"row-heavy left side was left to the stock plan:\n$p")
      assert(pairCounts(df)((1L, 101L)) === 1)
    }
    withRuleConf((1L << 30).toString, "8") {
      // both sides under the row ceiling: left is broadcastable, stock
      // plan stands
      val df = rightBand(errors, clicks)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("__graft_bkt"), s"rule fired despite a broadcastable left side:\n$p")
    }
  }

  test("right outer through the SQL surface") {
    errors.createOrReplaceTempView("rr_err")
    clicks.createOrReplaceTempView("rr_clk")
    val sql =
      """SELECT eid, cid FROM rr_err RIGHT JOIN rr_clk
        |ON u = cu AND cts >= ts - INTERVAL '1' SECOND AND cts < ts
        |""".stripMargin
    val want = pairCounts(spark.sql(sql))
    withRule {
      val df = spark.sql(sql)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(pairCounts(df) === want)
    }
  }

  test("full outer through the SQL surface") {
    errors.createOrReplaceTempView("rr_err")
    clicks.createOrReplaceTempView("rr_clk")
    val sql =
      """SELECT eid, cid FROM rr_err FULL JOIN rr_clk
        |ON u = cu AND cts >= ts - INTERVAL '1' SECOND AND cts < ts
        |""".stripMargin
    val want = pairCounts(spark.sql(sql))
    withRule {
      val df = spark.sql(sql)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(pairCounts(df) === want)
    }
  }

  test("left outer through the SQL surface") {
    errors.createOrReplaceTempView("rr_err")
    clicks.createOrReplaceTempView("rr_clk")
    val sql =
      """SELECT eid, cid FROM rr_err LEFT JOIN rr_clk
        |ON u = cu AND cts >= ts - INTERVAL '1' SECOND AND cts < ts
        |""".stripMargin
    val want = spark.sql(sql).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    withRule {
      val df = spark.sql(sql)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(df.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet === want)
    }
  }
}
