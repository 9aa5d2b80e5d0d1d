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
}
