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
      """"protocol":"warm1_median3_pooled2_retry","load1":4.9,"load1_start":0.6,""" +
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

  private def line(n: Int, warn: List[String] = Nil,
      names: Int => String = i => f"q$i%03d_synthetic_operator_name",
      contended: Boolean = false) =
    Bench.summaryLine(total = 1234.567, load1End = 4.9, load1Start = 0.4,
      load15Start = 0.7, waitedSec = 20, retries = 2, contended = contended,
      warnParts = warn,
      medians = (1 to n).map(i => names(i) -> i * 0.137), sf = "/root/testdata/sf0.1",
      protocol = Bench.protocolName(2))

  test("the wait target sits below the flag bar (startup-bump hysteresis)") {
    // the first two r14 runs released at load15 0.99 and snapshotted at
    // exactly 1.0 (sbt fork + JVM spin-up bump the average between loop
    // exit and telemetry) — the release target must leave headroom or
    // every run self-flags on a genuinely settled machine
    assert(Bench.WaitLoad15 <= Bench.QuietLoad15 - 0.15)
    assert(Bench.QuietLoad1 <= Bench.QuietLoad15)
  }

  test("summaryLine stamps the self-adjudicated contended verdict explicitly") {
    // r13 lesson: the driver records whatever this line says, so the
    // line itself must carry the trust verdict — both values, always
    assert(line(5).contains("\"contended\":false"))
    assert(line(5, contended = true).contains("\"contended\":true"))
  }

  test("summaryLine stays under the cap at 200 synthetic queries") {
    // the r04/r11 failure mode: the driver collector keeps ~2000 chars of
    // stdout tail; the line must stay bounded at ANY inventory size
    for (n <- Seq(0, 1, 10, 96, 200)) {
      val s = line(n)
      assert(s.length <= Bench.SummaryMaxChars, s"n=$n len=${s.length}")
      assert(s.startsWith("{") && s.endsWith("}"))
    }
  }

  test("summaryLine carries the worst-N medians and the full count") {
    val s = line(200)
    // worst query (largest median) present, best absent
    assert(s.contains("\"q200_synthetic_operator_name\":27.4"))
    assert(!s.contains("q001_synthetic_operator_name"))
    assert(s.contains(s""""queries_shown":${Bench.SummaryWorstN}"""))
    assert(s.contains("\"queries_total\":200"))
    assert(s.contains("\"value\":1234.567"))
    val shown = """"q\d+_synthetic_operator_name":""".r.findAllIn(s).size
    assert(shown == Bench.SummaryWorstN)
  }

  test("summaryLine trims an unbounded warning to fit, keeping it valid") {
    val warn = List("slow vs prior clean median: " +
      (1 to 200).map(i => f"q$i%03d_name $i.00s vs prior 0.10s").mkString(", "))
    val s = line(96, warn)
    assert(s.length <= Bench.SummaryMaxChars)
    assert(s.contains("\"warning\":\"slow vs prior"))
    assert(s.contains("...\""))
    // still exactly one JSON object: quotes balance
    assert(s.count(_ == '"') % 2 == 0)
  }

  test("summaryLine shrinks the query list under absurd name lengths") {
    val s = line(50, names = i => s"q$i" + "_x" * 200)
    assert(s.length <= Bench.SummaryMaxChars)
    assert(s.contains("\"queries_total\":50"))
  }

  test("summaryLine stamps the sidecar sha so the round artifact self-identifies") {
    // the r16 ask: BENCH_rNN.json carries only the worst-10 medians, so
    // it must pin WHICH detail file holds the full map. The sha is over
    // the run's detail bytes (content + trailing newline) at whatever
    // destination protectedWrite routed them to — bench_detail.json for
    // a clean full run, target/bench_detail.{partial,contended}.json
    // for a restricted/demoted run — checkable with
    // `sha256sum <routed detail file> | cut -c1-12`.
    val sha = Bench.sha256Hex12(detailLine)
    assert(sha.length == 12 && sha.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    val s = Bench.summaryLine(total = 1.0, load1End = 0.1, load1Start = 0.1,
      load15Start = 0.1, waitedSec = 0, retries = 0, contended = false,
      warnParts = Nil, medians = Seq("q01" -> 0.5), sf = "sf", protocol = "p",
      detailSha = sha)
    assert(s.contains(s""""detail_sha":"$sha""""))
    assert(s.length <= Bench.SummaryMaxChars)
    // deterministic over content, sensitive to any byte change
    assert(Bench.sha256Hex12(detailLine) == sha)
    assert(Bench.sha256Hex12(detailLine + " ") != sha)
  }

  test("artifactDest routes restricted and contended runs away from clean sidecars") {
    val p = "bench_detail.json"
    // clean full run replaces whatever is there
    assert(Bench.artifactDest(p, restrictedRun = false, contendedRun = false,
      existingClean = true) == p)
    assert(Bench.artifactDest(p, restrictedRun = false, contendedRun = false,
      existingClean = false) == p)
    // contended run never clobbers a clean sidecar...
    assert(Bench.artifactDest(p, restrictedRun = false, contendedRun = true,
      existingClean = true) == "target/bench_detail.contended.json")
    // ...but may replace an already-contended one (fresher wins)
    assert(Bench.artifactDest(p, restrictedRun = false, contendedRun = true,
      existingClean = false) == p)
    // a BENCH_ONLY run is always demoted, even when clean
    assert(Bench.artifactDest(p, restrictedRun = true, contendedRun = false,
      existingClean = false) == "target/bench_detail.partial.json")
    assert(Bench.artifactDest(p, restrictedRun = true, contendedRun = true,
      existingClean = true) == "target/bench_detail.partial.json")
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
