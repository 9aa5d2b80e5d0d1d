package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[RangeJoin.intervalJoin]] vs a brute-force theta join, with the
  * boundary cases that kill bucketing rewrites: rows exactly ON a
  * bucket boundary, windows spanning two buckets, half-open edges.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val W = 1000000L // 1 s buckets (beforeUs + afterUs)

  // times in µs; bucket boundary at each multiple of 1e6
  private lazy val left = Seq(
    (1, 1999999L, 100), (1, 2000000L, 101), (1, 2000001L, 102),
    (2, 5000000L, 200),
    (3, 1500000L, 300)
  ).toDF("k", "lus", "lid").withColumn("lt", timestamp_micros($"lus")).drop("lus")

  private lazy val right = Seq(
    (1, 1000000L, 900), (1, 1999999L, 901), (1, 2000000L, 902), (1, 2999999L, 903),
    (2, 4000000L, 904), (2, 4000001L, 905), (2, 5000000L, 906),
    (4, 1500000L, 907)
  ).toDF("k", "rus", "rid").withColumn("rt", timestamp_micros($"rus")).drop("rus")

  private def brute(beforeUs: Long, afterUs: Long): Set[(Int, Int)] = {
    val r = right.select($"k", unix_micros($"rt"), $"rid").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getInt(2)))
    left.select($"k", unix_micros($"lt"), $"lid").collect().flatMap { x =>
      val (k, t, lid) = (x.getInt(0), x.getLong(1), x.getInt(2))
      r.filter(c => c._1 == k && c._2 >= t - beforeUs && c._2 < t + afterUs)
        .map(c => (lid, c._3))
    }.toSet
  }

  private def got(beforeUs: Long, afterUs: Long): Set[(Int, Int)] =
    RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt", beforeUs, afterUs)
      .select($"lid", $"rid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  test("trailing window [t-W, t) matches brute force incl. boundaries") {
    assert(got(W, 0L) === brute(W, 0L))
  }

  test("centered window [t-W/2, t+W/2) matches brute force") {
    assert(got(W / 2, W / 2) === brute(W / 2, W / 2))
  }

  test("leading window [t, t+W) matches brute force") {
    assert(got(0L, W) === brute(0L, W))
  }

  test("each matched pair is produced exactly once (no bucket dup)") {
    val df = RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt", W, 0L)
      .groupBy($"lid", $"rid").count().filter($"count" > 1)
    assert(df.count() === 0)
  }

  test("plan: equi join on (key, bucket), no nested-loop or cartesian") {
    val p = RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt", W, 0L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join:\n$p")
  }
}
