package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's historical-prior detector is pure logic over the
  * sidecar format — testable without Spark. These cases pin the parse
  * (the sidecar is Bench's own output, so the format is closed) and
  * the jump predicate that decides when a median is out-of-family vs
  * the last clean run (the r10 d01 contamination shape). */
class BenchSpec extends AnyFunSuite {

  private val detailLine =
    """{"metric":"total_query_sec","value":45.083,"unit":"sec",""" +
      """"protocol":"warm1_median3_retry","load1":4.9,"load1_start":0.6,""" +
      """"waited_sec":95,"retries":0,""" +
      """"queries":{"q01_agg":0.312,"d01_minhash_lsh":1.571,"p03_state":1.4},""" +
      """"queries_min":{"q01_agg":0.301,"d01_minhash_lsh":1.512,"p03_state":1.3},""" +
      """"shuffle_read_mb":{"q01_agg":0.0,"d01_minhash_lsh":8.6,"p03_state":2.1},""" +
      """"sf":"/root/testdata/sf0.1"}"""

  test("parseQueryMedians extracts the medians map, not min/shuffle maps") {
    val m = Bench.parseQueryMedians(detailLine)
    assert(m == Map("q01_agg" -> 0.312, "d01_minhash_lsh" -> 1.571, "p03_state" -> 1.4))
  }

  test("parseQueryMedians on garbage or missing map is empty, never throws") {
    assert(Bench.parseQueryMedians("").isEmpty)
    assert(Bench.parseQueryMedians("not json at all").isEmpty)
    assert(Bench.parseQueryMedians("""{"metric":"total_query_sec","value":1.0}""").isEmpty)
  }

  test("slowVsPrior flags the r10 d01 shape and tolerates normal drift") {
    // the real case: 6.8 s official vs 1.57 s prior clean median
    assert(Bench.slowVsPrior(6.8, prior = 1.571))
    // 2x + floor boundary: just under stays quiet, just over flags
    assert(!Bench.slowVsPrior(1.571 * 2 + 0.29, prior = 1.571))
    assert(Bench.slowVsPrior(1.571 * 2 + 0.31, prior = 1.571))
    // sub-second queries need the absolute floor: 2.5x on 0.1 s is jitter
    assert(!Bench.slowVsPrior(0.25, prior = 0.1))
    // improvement or parity never flags
    assert(!Bench.slowVsPrior(0.9, prior = 1.571))
    assert(!Bench.slowVsPrior(1.571, prior = 1.571))
  }
}
