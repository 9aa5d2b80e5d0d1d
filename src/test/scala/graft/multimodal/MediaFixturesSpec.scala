package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The m04 round-trip, suite-side: every fixture's payload must decode
  * (through the REAL header parsers — only kind 6 is fallback by
  * design) to exactly the pinned expectation. This is the same check
  * the oracle gate performs, runnable without Spark or DuckDB. */
class MediaFixturesSpec extends AnyFunSuite {

  test("every fixture decodes to its pinned expectation") {
    MediaFixtures.fixtures.foreach { f =>
      val r = Multimodal.decodeOne(f.mediaId, f.payload)
      val got = (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]), Option(r.get(4)).map(_.asInstanceOf[Int]),
        r.getInt(5), r.getLong(6))
      val want = (f.mediaId, f.byteLen, f.format, f.width, f.height, f.nFrames, f.durationMs)
      assert(got == want, s"fixture ${f.mediaId} (${f.format})")
    }
  }

  test("the corpus covers all six real formats plus the fallback, unique ids") {
    val fs = MediaFixtures.fixtures
    assert(fs.map(_.mediaId).distinct.size == fs.size)
    // kinds 0-5 are real containers; kind 6 reuses image format names
    // through the fallback formula, so count by construction slot
    val realFormats = fs.zipWithIndex.collect { case (f, i) if i % 7 < 6 => f.format }.toSet
    assert(realFormats == Set("png", "jpeg", "gif", "webp", "wav", "mp4"))
    // real parses are distinguishable from the fallback: a png fixture's
    // dimensions come from the header, not the byte-length formula
    val p = fs.find(f => f.format == "png" && f.payload.length >= 8 &&
      (f.payload(0) & 0xff) == 0x89).get
    assert(p.width.get != (64 + p.byteLen % 1856).toInt || p.height.get != (64 + (p.byteLen * 7) % 1016).toInt)
  }

  test("the oracle VALUES literal carries one row per fixture with NULLs for audio") {
    val sql = MediaFixtures.oracleSql
    assert(MediaFixtures.fixtures.forall(f => sql.contains(s"(${f.mediaId},")))
    assert(sql.contains("NULL,NULL")) // wav rows pin null width/height
  }
}
