package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[AsOf.joinAsOf]] against a driver-side brute-force oracle, plus the
  * plan property that makes it scale: one window pass, one shuffle.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixture: ids spread over 3 keys with
  // colliding and out-of-order times, including keys with no right rows
  // and right rows after every left row
  private lazy val left = Seq(
    // (key, t, lid)
    (1, 100L, 10), (1, 205L, 11), (1, 205L, 12), (1, 50L, 13),
    (2, 10L, 20), (2, 500L, 21),
    (3, 40L, 30),
    (4, 99L, 40)
  ).toDF("k", "t", "lid")

  private lazy val right = Seq(
    // (key, rt, rid) — unique per (k, rt) as the contract requires
    (1, 100L, 910), (1, 180L, 911), (1, 300L, 912),
    (2, 11L, 920),
    (3, 40L, 930), (3, 39L, 931)
  ).toDF("k", "rt", "rid")

  private def brute(): Set[(Int, Long, Int, Option[Int])] = {
    val r = right.collect().map(x => (x.getInt(0), x.getLong(1), x.getInt(2)))
    left.collect().map { x =>
      val (k, t, lid) = (x.getInt(0), x.getLong(1), x.getInt(2))
      val best = r.filter(c => c._1 == k && c._2 <= t).sortBy(c => (c._2, c._3)).lastOption
      (k, t, lid, best.map(_._3))
    }.toSet
  }

  test("matches the brute-force latest-at-or-before semantics") {
    val got = AsOf.joinAsOf(left, right, Seq("k"), "t", "rt")
      .select($"k", $"t", $"lid", $"rid")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), if (r.isNullAt(3)) None else Some(r.getInt(3))))
      .toSet
    assert(got === brute())
  }

  test("ties at equal time are inclusive (right row at t matches)") {
    val got = AsOf.joinAsOf(left, right, Seq("k"), "t", "rt")
      .filter($"lid" === 10).select($"rid").as[Int].head()
    assert(got === 910) // the right row AT t=100 wins (inclusive <=)
  }

  test("left rows with no prior right row keep null payloads") {
    val got = AsOf.joinAsOf(left, right, Seq("k"), "t", "rt")
      .filter($"lid" === 40 || $"lid" === 20 || $"lid" === 13)
    assert(got.count() === 3)
    assert(got.filter($"rid".isNull).count() === 3)
  }

  test("plan: a single Exchange and a single Sort — merge-join shape") {
    val p = AsOf.joinAsOf(left, right, Seq("k"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"expected one shuffle, got $exchanges:\n$p")
    // all carried payloads collapse into ONE Window operator
    assert("(?m)^\\s*\\+?-?\\s*Window".r.findAllIn(p).size === 1, s"expected one Window:\n$p")
  }
}
