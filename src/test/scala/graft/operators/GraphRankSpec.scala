package graft.operators

import graft.SparkSpec

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  test("one iteration on a path graph matches the hand computation") {
    // path 1 - 2 - 3: deg(1)=deg(3)=1, deg(2)=2
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = GraphRank.pageRank(edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    // inflow(1) = 1e9 div 2 = 5e8 -> 15e7 + 85*5e8 div 100 = 575_000_000
    // inflow(2) = 1e9 + 1e9     -> 15e7 + 85*2e9 div 100 = 1_850_000_000
    assert(r == Map(1L -> 575000000L, 2L -> 1850000000L, 3L -> 575000000L))
  }

  test("direction of the input edge list is irrelevant (undirected view)") {
    val a = GraphRank.pageRank(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    val b = GraphRank.pageRank(Seq((2L, 1L), (3L, 2L)).toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    val c = GraphRank.pageRank( // duplicate edges change nothing either
        Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 2L)).toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b && a == c)
  }

  test("a star center outranks its leaves and total mass never exceeds N x 1e9") {
    val edges = (2L to 9L).map(l => (1L, l)).toDF("src", "dst")
    val r = GraphRank.pageRank(edges, iters = 3).as[(Long, Long)].collect()
    val byId = r.toMap
    assert((2L to 9L).forall(l => byId(1L) > byId(l)))
    assert((2L to 9L).map(byId).distinct.size == 1) // leaves symmetric
    // integer-division evaporation only loses mass; teleport injects
    // exactly 0.15e9 per node per round: the invariant that keeps the
    // scores bounded at any graph size
    assert(r.map(_._2).sum <= r.length * 1000000000L)
  }

  test("the overflow-safe damping identity matches the plain product form") {
    // d*(x div 100) + (d*(x mod 100)) div 100 == (d*x) div 100 for all
    // x >= 0 — the rewrite that avoids forming d*x (which wraps Long
    // past Long.MaxValue/d). Checked on small values against the plain
    // form and on near-overflow values against BigInt.
    val rnd = new scala.util.Random(7)
    for (d <- Seq(0, 15, 85, 100); _ <- 0 until 200) {
      val small = rnd.nextLong(1000000000000L)
      assert(d * (small / 100) + (d * (small % 100)) / 100 == (d * small) / 100)
      val huge = Long.MaxValue - rnd.nextLong(1000000L) // d * huge overflows
      val safe = d * (huge / 100) + (d * (huge % 100)) / 100
      assert(BigInt(safe) == (BigInt(d) * BigInt(huge)) / 100)
    }
  }

  test("disconnected components do not leak mass into each other") {
    val edges = Seq((1L, 2L), (10L, 11L), (11L, 12L)).toDF("src", "dst")
    val whole = GraphRank.pageRank(edges, 2).as[(Long, Long)].collect().toMap
    val solo = GraphRank.pageRank(Seq((1L, 2L)).toDF("src", "dst"), 2)
      .as[(Long, Long)].collect().toMap
    assert(whole(1L) == solo(1L) && whole(2L) == solo(2L))
  }

  test("unit weights reduce pageRankWeighted to pageRank exactly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (10L, 11L))
    val flat = GraphRank.pageRank(edges.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    val weighted = GraphRank.pageRankWeighted(
        edges.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"), 3)
      .as[(Long, Long)].collect().toMap
    assert(weighted == flat)
    // parallel edges sum into a weight — (1,2)x2 equals w=2 on (1,2)
    val dup = GraphRank.pageRankWeighted(
        Seq((1L, 2L, 1L), (1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w"), 2)
      .as[(Long, Long)].collect().toMap
    val merged = GraphRank.pageRankWeighted(
        Seq((1L, 2L, 2L), (2L, 3L, 1L)).toDF("src", "dst", "w"), 2)
      .as[(Long, Long)].collect().toMap
    assert(dup == merged)
  }

  test("non-positive weights fail fast instead of NULLing out of the inflow sum") {
    for (bad <- Seq(0L, -3L)) {
      val e = Seq((1L, 2L, 5L), (2L, 3L, bad)).toDF("src", "dst", "w")
      val ex = intercept[Exception](GraphRank.pageRankWeighted(e, 1).collect())
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(ex).exists(_.contains("edge weight must be > 0")), s"w=$bad: $ex")
    }
  }

  test("fractional weights that would truncate to zero are rejected, not silently dropped") {
    // 0.5 passes a naive pre-cast w > 0 test, then CAST AS BIGINT makes
    // it 0 — the check must run on the cast value
    val e = Seq((1L, 2L, 5.0), (2L, 3L, 0.5)).toDF("src", "dst", "w")
    val ex = intercept[Exception](GraphRank.pageRankWeighted(e, 1).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("edge weight must be > 0")))
  }

  test("a NULL edge endpoint fails fast instead of canonicalizing into a self-loop") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val e = Seq((Some(1L), Some(2L)), (None, Some(3L)))
      .toDF("src", "dst")
    val ex = intercept[Exception](GraphRank.pageRank(e, 1).collect())
    // the unweighted build collapses null-endpoint edges into the one
    // (null, null) canonical pair, so the message is column-agnostic
    assert(messages(ex).exists(_.contains("edge endpoint is NULL")))
    val ew = Seq((Some(1L), Some(2L), 1L), (Some(4L), None, 1L))
      .toDF("src", "dst", "w")
    val exw = intercept[Exception](GraphRank.pageRankWeighted(ew, 1).collect())
    assert(messages(exw).exists(_.contains("edge endpoint dst is NULL")))
  }

  test("total incident weight past sqrt(2^63) is rejected, at the documented bound") {
    // one hub edge carrying the whole budget: wsum = w. Just under the
    // bound runs; just over raises the documented rescale message.
    val ok = Seq((1L, 2L, 3037000499L)).toDF("src", "dst", "w")
    assert(GraphRank.pageRankWeighted(ok, 1).count() == 2)
    val over = Seq((1L, 2L, 3037000500L)).toDF("src", "dst", "w")
    val ex = intercept[IllegalArgumentException](GraphRank.pageRankWeighted(over, 1))
    assert(ex.getMessage.contains("rescale weights"))
  }

  test("a heavier edge pulls proportionally more mass") {
    // star: center 1 sends to 2 (w=9) and 3 (w=1): after one round the
    // heavy neighbor holds 9x the center-inflow of the light one
    val edges = Seq((1L, 2L, 9L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r = GraphRank.pageRankWeighted(edges, 1).as[(Long, Long)].collect().toMap
    // center wsum = 10: node 2 inflow = 9e8 (from 1) + ... node 2 also
    // sends back (its whole mass, single edge). Hand computation:
    // in(2) = (1e9*9) div 10 = 9e8 -> 15e7 + 85*9e8 div 100 = 915e6
    // in(3) = (1e9*1) div 10 = 1e8 -> 15e7 + 85*1e8 div 100 = 235e6
    // in(1) = 1e9 (from 2) + 1e9 (from 3) -> 15e7 + 85*2e9 div 100
    assert(r(2L) == 915000000L && r(3L) == 235000000L && r(1L) == 1850000000L)
    assert(r(2L) > r(3L))
  }
}
