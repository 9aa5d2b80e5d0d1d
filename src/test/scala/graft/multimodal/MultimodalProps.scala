package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Property-style fuzz of the decode contract (seeded random
  * mutation, DedupProps style): every header parser is claimed to
  * NEVER throw — corrupt, truncated, or alien bytes must read as
  * "not this format" (None) or a best-effort parse, and
  * [[Multimodal.decodeOne]] must always produce a full metadata row.
  * The round-trip exactness of clean payloads is MediaFixturesSpec's
  * job; this suite guards totality under hostile input, the property
  * a 100 TB ingest of crawled media actually needs. */
class MultimodalProps extends AnyFunSuite {

  // all builders across the fixture corpus's real kinds
  private def cleanPayloads: Seq[Array[Byte]] =
    MediaFixtures.fixtures.map(_.payload)

  private def mutations(b: Array[Byte], rnd: scala.util.Random): Seq[Array[Byte]] = {
    val truncated = b.take(rnd.nextInt(b.length + 1))
    val flipped = {
      val c = b.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        if (c.nonEmpty) c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      }
      c
    }
    val doubled = b ++ b
    val shifted = new Array[Byte](rnd.nextInt(8)) ++ b
    val garbageTail = b ++ Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
    Seq(truncated, flipped, doubled, shifted, garbageTail)
  }

  test("no parser throws on truncated / bit-flipped / concatenated / shifted payloads") {
    val rnd = new scala.util.Random(4242)
    for (clean <- cleanPayloads; mutant <- mutations(clean, rnd)) {
      // each parser individually: Option out, never an exception
      Multimodal.ImageHeader.parse(mutant)
      Multimodal.ImageHeader.gifFrameCount(mutant)
      Multimodal.ImageHeader.webpFrameCount(mutant)
      Multimodal.WavHeader.parse(mutant)
      Multimodal.Mp3Header.parse(mutant)
      Multimodal.FlacHeader.parse(mutant)
      Multimodal.OggHeader.parse(mutant)
      Multimodal.Mp4Header.parse(mutant)
      Multimodal.MkvHeader.parse(mutant)
      // and the dispatch always yields a complete row with the id and
      // true byte length regardless of what the payload claims
      val row = Multimodal.decodeOne(77L, mutant)
      assert(row.getLong(0) == 77L)
      assert(row.getLong(1) == mutant.length.toLong)
      assert(row.getString(2) != null)
    }
  }

  test("no parser throws on pure random bytes at assorted sizes") {
    val rnd = new scala.util.Random(1717)
    for (n <- Seq(0, 1, 3, 4, 8, 12, 27, 44, 58, 100, 1024); _ <- 0 until 20) {
      val b = Array.fill(n)(rnd.nextInt(256).toByte)
      val row = Multimodal.decodeOne(5L, b)
      assert(row.getLong(1) == n.toLong)
    }
  }

  test("magic-byte prefixes with hostile bodies never throw") {
    val rnd = new scala.util.Random(99)
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "GIF89a".getBytes("ISO-8859-1"),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),
      "RIFF????WEBP".getBytes("ISO-8859-1"),
      "RIFF????WAVE".getBytes("ISO-8859-1"),
      "fLaC".getBytes("ISO-8859-1"),
      "OggS".getBytes("ISO-8859-1"),
      "ID3".getBytes("ISO-8859-1"),
      Array[Byte](0, 0, 0, 32) ++ "ftyp".getBytes("ISO-8859-1")
    )
    for (m <- magics; n <- Seq(0, 5, 40, 200); _ <- 0 until 10) {
      val b = m ++ Array.fill(n)(rnd.nextInt(256).toByte)
      val row = Multimodal.decodeOne(1L, b)
      assert(row.getLong(1) == b.length.toLong)
    }
  }
}
