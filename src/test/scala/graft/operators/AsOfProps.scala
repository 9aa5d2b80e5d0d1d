package graft.operators

import graft.SparkSpec

/** Property-style tests for the as-of and range joins: equivalence with
  * a driver-side brute force over seeded random event sets — times
  * collide, keys are skewed, and right rows cluster so the bucketing /
  * tie edge cases all occur (plain deterministic generation — the
  * scalatest/scalacheck bridge artifact is not on the offline
  * classpath). */
class AsOfProps extends SparkSpec {
  import spark.implicits._

  // small domains on purpose: collisions in (key, time) must occur
  private def randRows(rnd: scala.util.Random, n: Int): Seq[(Int, Long, Int)] =
    Seq.tabulate(n)(i => (rnd.nextInt(4), rnd.nextInt(50).toLong, i))

  test("as-of join equals brute force over 10 random instances") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 10) {
      val lRows = randRows(rnd, 30)
      // unique (k, t) on the right, as the operator contract requires
      val rRows = randRows(rnd, 30).groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      val left = lRows.toDF("k", "t", "lid")
      val right = rRows.map { case (k, t, i) => (k, t, 1000 + i) }.toDF("k", "rt", "rid")

      val got = AsOf.joinAsOf(left, right, Seq("k"), "t", "rt")
        .select($"lid", $"rid").collect()
        .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap

      val rIdx = rRows.map { case (k, t, i) => (k, t, 1000 + i) }
      val want = lRows.map { case (k, t, lid) =>
        lid -> rIdx.filter(c => c._1 == k && c._2 <= t).sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got === want, s"round $round mismatch")
    }
  }

  test("range join equals brute force over 10 random window shapes") {
    val rnd = new scala.util.Random(13)
    for (round <- 1 to 10) {
      val before = rnd.nextInt(20).toLong * 1000000L
      val after = (rnd.nextInt(20).toLong + (if (before == 0) 1 else 0)) * 1000000L
      val lRows = randRows(rnd, 25).map { case (k, t, i) => (k, t * 1000000L, i) }
      val rRows = randRows(rnd, 25).map { case (k, t, i) => (k, t * 1000000L, 1000 + i) }
      val left = lRows.toDF("k", "lus", "lid")
        .select($"k", org.apache.spark.sql.functions.timestamp_micros($"lus").as("lt"), $"lid")
      val right = rRows.toDF("k", "rus", "rid")
        .select($"k", org.apache.spark.sql.functions.timestamp_micros($"rus").as("rt"), $"rid")

      val got = RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt", before, after)
        .select($"lid", $"rid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val want = (for {
        (k, lt, lid) <- lRows
        (rk, rt, rid) <- rRows
        if rk == k && rt >= lt - before && rt < lt + after
      } yield (lid, rid)).toSet
      assert(got === want, s"round $round (before=$before after=$after) mismatch")
    }
  }
}
