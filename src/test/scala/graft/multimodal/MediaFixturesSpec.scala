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

  test("the corpus covers all eleven real containers plus the fallback, unique ids") {
    val fs = MediaFixtures.fixtures
    assert(fs.map(_.mediaId).distinct.size == fs.size)
    // kinds 0-9 are real containers; kind 10 reuses image format names
    // through the fallback formula, so count by construction slot
    val realFormats = fs.zipWithIndex.collect { case (f, i) if i % 11 < 10 => f.format }.toSet
    assert(realFormats ==
      Set("png", "jpeg", "gif", "webp", "wav", "mp4", "mp3", "flac", "vorbis", "opus",
        "webm", "mkv"))
    // real parses are distinguishable from the fallback: a png fixture's
    // dimensions come from the header, not the byte-length formula
    val p = fs.find(f => f.format == "png" && f.payload.length >= 8 &&
      (f.payload(0) & 0xff) == 0x89).get
    assert(p.width.get != (64 + p.byteLen % 1856).toInt || p.height.get != (64 + (p.byteLen * 7) % 1016).toInt)
  }

  test("Mp3Header: ID3 skip, version geometry, truncation and rejection rules") {
    import Multimodal.Mp3Header
    // 44.1 kHz v1 @128 kbps: 1152 samples/frame -> 26.122... ms/frame
    val v1 = MediaFixtures.mp3(version = 1, bitrateIdx = 9, rateIdx = 0, frames = 4, id3Bytes = 0)
    assert(Mp3Header.parse(v1) == Some((4, 4L * (1152L * 1000000L / 44100L) / 1000L)))
    // v2.5 8 kHz: 576 samples/frame = 72 ms exactly
    val v25 = MediaFixtures.mp3(25, 5, 2, 3, id3Bytes = 0)
    assert(Mp3Header.parse(v25) == Some((3, 216L)))
    // an ID3v2 tag is skipped, and makes a single-frame stream valid
    val tagged = MediaFixtures.mp3(2, 7, 1, 1, id3Bytes = 300)
    assert(Mp3Header.parse(tagged) == Some((1, 576L * 1000000L / 24000L / 1000L)))
    // without a tag, one lone frame is not enough evidence
    assert(Mp3Header.parse(MediaFixtures.mp3(1, 9, 0, 1, 0)).isEmpty)
    // a truncated final frame ends the walk cleanly and doesn't count
    assert(Mp3Header.parse(v1.dropRight(3)) == Some((3, 3L * (1152L * 1000000L / 44100L) / 1000L)))
    // garbage mid-stream rejects the payload entirely
    val dirty = v1.clone(); dirty(v1.length / 4) = 0x00 // clobber the second frame's sync
    assert(Mp3Header.parse(dirty).isEmpty)
    assert(Mp3Header.parse("plain text payload".getBytes("UTF-8")).isEmpty)
    assert(Mp3Header.parse(Array.emptyByteArray).isEmpty)
    // an ID3 tag whose syncsafe size overruns the buffer is rejected
    val evil = MediaFixtures.mp3(1, 9, 0, 2, id3Bytes = 50).take(30)
    assert(Mp3Header.parse(evil).isEmpty)
    // dispatch: decodeOne reports mp3 with null dimensions
    val row = Multimodal.decodeOne(21L, v1)
    assert(row.getAs[String](2) == "mp3" && row.get(3) == null && row.get(4) == null)
    assert(row.getAs[Int](5) == 4)
  }

  test("FlacHeader: STREAMINFO geometry, truncation and rejection rules") {
    import Multimodal.FlacHeader
    // 44.1 kHz, 88200 samples = exactly 2000 ms
    val f = MediaFixtures.flac(44100, 88200L)
    assert(FlacHeader.parse(f) == Some((88200L, 2000L)))
    // a >32-bit total exercises the 36-bit field's high nibble
    val big = MediaFixtures.flac(96000, 0x2_0000_0000L) // 2^33
    assert(FlacHeader.parse(big).map(_._1) == Some(0x2_0000_0000L))
    // truncated mid-STREAMINFO, wrong magic, unknown-total streams reject
    assert(FlacHeader.parse(f.take(20)).isEmpty)
    assert(FlacHeader.parse("fLaX1234".getBytes("ISO-8859-1")).isEmpty)
    assert(FlacHeader.parse(MediaFixtures.flac(44100, 0L)).isEmpty) // total 0 = unknown
    assert(FlacHeader.parse(Array.emptyByteArray).isEmpty)
    // a stream whose first block is NOT STREAMINFO violates the spec
    val wrongFirst = f.clone(); wrongFirst(4) = (0x80 | 4).toByte // VORBIS_COMMENT
    assert(FlacHeader.parse(wrongFirst).isEmpty)
    // dispatch: decodeOne reports flac with null dimensions
    val row = Multimodal.decodeOne(31L, f)
    assert(row.getAs[String](2) == "flac" && row.get(3) == null && row.get(4) == null)
    assert(row.getAs[Int](5) == 88200 && row.getAs[Long](6) == 2000L)
  }

  test("OggHeader: Vorbis/Opus dispatch, final-granule duration, rejection rules") {
    import Multimodal.OggHeader
    // Vorbis: duration from the EOS page's granule at the id header's rate
    val v = MediaFixtures.oggVorbis(8000, 16000L)
    assert(OggHeader.parse(v) == Some(("vorbis", 16000L, 2000L)))
    // Opus: granule ticks are 48 kHz and pre-skip is subtracted
    val o = MediaFixtures.oggOpus(312, 312L + 48000L)
    assert(OggHeader.parse(o) == Some(("opus", 48000L, 1000L)))
    // a truncated final page keeps the last complete page's granule
    val cut = v.dropRight(10)
    assert(OggHeader.parse(cut) == Some(("vorbis", 8000L, 1000L)))
    // wrong magic / unknown codec / empty all reject
    assert(OggHeader.parse("OggX".getBytes("ISO-8859-1")).isEmpty)
    val alien = v.clone(); alien(28) = 0x7f // clobber the id header's packet type
    assert(OggHeader.parse(alien).isEmpty)
    assert(OggHeader.parse(Array.emptyByteArray).isEmpty)
    // dispatch: decodeOne reports the codec with null dimensions
    val row = Multimodal.decodeOne(32L, o)
    assert(row.getAs[String](2) == "opus" && row.get(3) == null && row.get(4) == null)
    assert(row.getAs[Int](5) == 48000 && row.getAs[Long](6) == 1000L)
  }

  test("MkvHeader: EBML walk, DocType dispatch, per-track block count, rejection rules") {
    import Multimodal.MkvHeader
    // 1e6 ns/unit, 2500.0 units = 2500 ms; 3 video SimpleBlocks (the
    // builder adds one audio-track block that must NOT count)
    val w = MediaFixtures.mkv("webm", 320, 240, 3, 1000000L, 2500.0)
    assert(MkvHeader.parse(w) == Some(("webm", 320, 240, 3, 2500L)))
    // a non-webm DocType reads as generic matroska
    val m = MediaFixtures.mkv("matroska", 64, 48, 1, 500000L, 1000.0)
    assert(MkvHeader.parse(m) == Some(("mkv", 64, 48, 1, 500L)))
    // truncation keeps what was parsed up to the cut (never throws)
    assert(MkvHeader.parse(w.take(10)).isEmpty) // cut inside the EBML header
    // wrong magic / empty reject
    assert(MkvHeader.parse("notanebml000".getBytes("ISO-8859-1")).isEmpty)
    assert(MkvHeader.parse(Array.emptyByteArray).isEmpty)
    // an audio-only segment (no video track) falls back
    val audioOnly = w.clone()
    // clobber the video TrackEntry's TrackType value (1 -> 2): the
    // type uint sits right after the 0x83 id + 2-byte size
    val idx = {
      var k = -1
      var i = 0
      while (k < 0 && i < audioOnly.length - 3) {
        if ((audioOnly(i) & 0xff) == 0x83 && (audioOnly(i + 1) & 0xff) == 0x40 &&
          audioOnly(i + 2) == 1 && audioOnly(i + 3) == 1) k = i + 3
        i += 1
      }
      k
    }
    assert(idx > 0)
    audioOnly(idx) = 2
    assert(MkvHeader.parse(audioOnly).isEmpty)
    // dispatch: decodeOne reports webm with real dims
    val row = Multimodal.decodeOne(41L, w)
    assert(row.getAs[String](2) == "webm")
    assert(row.getAs[Int](3) == 320 && row.getAs[Int](4) == 240)
    assert(row.getAs[Int](5) == 3 && row.getAs[Long](6) == 2500L)
  }

  test("the oracle VALUES literal carries one row per fixture with NULLs for audio") {
    val sql = MediaFixtures.oracleSql
    assert(MediaFixtures.fixtures.forall(f => sql.contains(s"(${f.mediaId},")))
    assert(sql.contains("NULL,NULL")) // wav rows pin null width/height
  }
}
