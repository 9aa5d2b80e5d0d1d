package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic binary media fixtures for the oracle gate.
  *
  * Each fixture is built bytes-up to its public container spec
  * (PNG / JPEG / GIF / WebP / WAV / MP3 / FLAC / Ogg / ISO-BMFF MP4)
  * from index-derived
  * parameters, and carries the EXPECTED metadata computed from those
  * same parameters — never by calling the parsers under test. The m04
  * query decodes the payloads through [[Multimodal.decodeMetadata]]'s
  * real header parsers while the DuckDB oracle reads the pinned
  * expectations as a VALUES literal ([[oracleSql]]), so the
  * CORRECTNESS row is a round-trip gate: params → builder → bytes →
  * parser → params. A drift in either the builders or the parsers
  * hash-mismatches.
  *
  * Everything here is a pure function of the row index — no files, no
  * randomness, no clock — so Spark and the oracle agree across
  * processes and rounds.
  */
object MediaFixtures {

  /** One fixture: the payload plus its pinned expected metadata in
    * [[Multimodal.mediaMetaSchema]] shape. */
  final case class Fixture(
      mediaId: Long,
      payload: Array[Byte],
      format: String,
      width: Option[Int],
      height: Option[Int],
      nFrames: Int,
      durationMs: Long) {
    def byteLen: Long = payload.length.toLong
  }

  // --- byte builders (public container specs, stdlib only) -----------------

  private def le16b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le24b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte)
  private def le32b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def be16b(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def be32b(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def cc(s: String) = s.getBytes("ISO-8859-1")

  /** Minimal PNG: signature, IHDR with the real dimensions, IEND. The
    * CRCs are zeroed — header parsing doesn't checksum. */
  def png(w: Int, h: Int): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32b(13) ++ cc("IHDR") ++ be32b(w) ++ be32b(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32b(0) ++ // bit depth, truecolor, zero CRC
      be32b(0) ++ cc("IEND") ++ be32b(0)

  /** Minimal JPEG: SOI, one SOF0 frame header (3 components), EOI. */
  def jpeg(w: Int, h: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xc0.toByte) ++
      be16b(17) ++ Array[Byte](8) ++ be16b(h) ++ be16b(w) ++ Array[Byte](3) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)

  /** GIF89a with `frames` image descriptors (no color tables, one
    * 1-byte LZW sub-block per frame) and a trailer. */
  def gif(w: Int, h: Int, frames: Int): Array[Byte] = {
    val frame = Array[Byte](0x2c) ++ le16b(0) ++ le16b(0) ++ le16b(w) ++ le16b(h) ++
      Array[Byte](0, 2, 1, 0, 0) // packed, LZW min code, sub-block(len 1), terminator
    cc("GIF89a") ++ le16b(w) ++ le16b(h) ++ Array[Byte](0, 0, 0) ++
      (0 until frames).flatMap(_ => frame).toArray ++ Array[Byte](0x3b)
  }

  private def riffChunk(tag: String, payload: Array[Byte]): Array[Byte] =
    cc(tag) ++ le32b(payload.length) ++ payload ++
      (if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)

  private def webpFile(chunks: Array[Byte]*): Array[Byte] = {
    val body = cc("WEBP") ++ chunks.flatten
    cc("RIFF") ++ le32b(body.length) ++ body
  }

  /** Lossy (VP8) WebP still: 3-byte frame tag, start code, 14-bit dims. */
  def webpLossy(w: Int, h: Int): Array[Byte] =
    webpFile(riffChunk("VP8 ",
      Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++ le16b(w) ++ le16b(h)))

  /** Lossless (VP8L) WebP still: 0x2F, then (w-1) | (h-1) << 14, LE. */
  def webpLossless(w: Int, h: Int): Array[Byte] =
    webpFile(riffChunk("VP8L", Array[Byte](0x2f) ++ le32b((w - 1) | ((h - 1) << 14))))

  /** Extended (VP8X) WebP with `frames` ANMF chunks (0 = still). */
  def webpExtended(w: Int, h: Int, frames: Int): Array[Byte] = {
    val vp8x = riffChunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++ le24b(w - 1) ++ le24b(h - 1))
    webpFile(vp8x +: (0 until frames).map(_ => riffChunk("ANMF", new Array[Byte](16))): _*)
  }

  /** PCM WAV: fmt chunk with the real sample geometry, data chunk of
    * `sampleFrames * blockAlign` deterministic bytes. */
  def wav(sampleRate: Int, channels: Int, sampleFrames: Int): Array[Byte] = {
    val blockAlign = 2 * channels // 16-bit PCM
    val byteRate = sampleRate * blockAlign
    val data = Array.tabulate[Byte](sampleFrames * blockAlign)(i => ((i * 37) & 0xff).toByte)
    val fmt = riffChunk("fmt ", le16b(1) ++ le16b(channels) ++ le32b(sampleRate) ++
      le32b(byteRate) ++ le16b(blockAlign) ++ le16b(16))
    val body = cc("WAVE") ++ fmt ++ riffChunk("data", data)
    cc("RIFF") ++ le32b(body.length) ++ body
  }

  // Layer III geometry, duplicated here on purpose: the fixture's
  // expectation must come from the public tables, not from the parser
  // under test
  private val mp3BitrateV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val mp3BitrateV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val mp3Rates = Map(
    1 -> Array(44100, 48000, 32000),
    2 -> Array(22050, 24000, 16000),
    25 -> Array(11025, 12000, 8000))

  /** (sampleRate, samplesPerFrame, frameBytes) for a Layer III frame
    * at the given table coordinates; `version` ∈ {1, 2, 25}. */
  def mp3Geometry(version: Int, bitrateIdx: Int, rateIdx: Int): (Int, Int, Int) = {
    val rate = mp3Rates(version)(rateIdx)
    val kbps = (if (version == 1) mp3BitrateV1 else mp3BitrateV2)(bitrateIdx)
    val spf = if (version == 1) 1152 else 576
    (rate, spf, spf / 8 * (kbps * 1000) / rate)
  }

  /** MPEG Layer III stream: `frames` identical zero-payload frames,
    * optionally behind an ID3v2 tag of `id3Bytes` content bytes. */
  def mp3(version: Int, bitrateIdx: Int, rateIdx: Int, frames: Int, id3Bytes: Int): Array[Byte] = {
    val vb = version match { case 1 => 3; case 2 => 2; case _ => 0 }
    val h = (0x7ff << 21) | (vb << 19) | (1 << 17) | (1 << 16) | (bitrateIdx << 12) | (rateIdx << 10)
    val (_, _, frameBytes) = mp3Geometry(version, bitrateIdx, rateIdx)
    val frame = be32b(h) ++ new Array[Byte](frameBytes - 4)
    val id3 =
      if (id3Bytes == 0) Array.emptyByteArray
      else cc("ID3") ++ Array[Byte](4, 0, 0) ++
        Array[Byte](((id3Bytes >> 21) & 0x7f).toByte, ((id3Bytes >> 14) & 0x7f).toByte,
          ((id3Bytes >> 7) & 0x7f).toByte, (id3Bytes & 0x7f).toByte) ++
        Array.tabulate[Byte](id3Bytes)(i => ((i * 17) & 0x7f).toByte)
    id3 ++ (0 until frames).flatMap(_ => frame).toArray
  }

  /** FLAC: "fLaC" magic + a single (last) STREAMINFO metadata block
    * with the packed sample geometry, then a few deterministic bytes
    * standing in for audio frames. */
  def flac(sampleRate: Int, totalSamples: Long): Array[Byte] = {
    val info = new Array[Byte](34)
    // min/max block size 4096 (spec-typical); frame-size fields zero
    info(0) = 0x10; info(1) = 0; info(2) = 0x10; info(3) = 0
    info(10) = (sampleRate >> 12).toByte
    info(11) = ((sampleRate >> 4) & 0xff).toByte
    // rate low nibble | (channels-1 = 1, stereo) << 1 | (bps-1 = 15) >> 4
    info(12) = (((sampleRate & 0xf) << 4) | (1 << 1) | (15 >> 4)).toByte
    info(13) = (((15 & 0xf) << 4) | ((totalSamples >> 32) & 0xf)).toByte
    info(14) = ((totalSamples >> 24) & 0xff).toByte
    info(15) = ((totalSamples >> 16) & 0xff).toByte
    info(16) = ((totalSamples >> 8) & 0xff).toByte
    info(17) = (totalSamples & 0xff).toByte
    cc("fLaC") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ info ++
      Array.tabulate[Byte](24)(i => ((i * 41) & 0xff).toByte)
  }

  private def oggPage(headerType: Int, granule: Long, seq: Int, payload: Array[Byte]): Array[Byte] = {
    // one segment per 255-byte lace + terminal short lace (payload < 255 here)
    require(payload.length < 255, "fixture pages are single-segment")
    cc("OggS") ++ Array[Byte](0, headerType.toByte) ++
      le32b((granule & 0xffffffffL).toInt) ++ le32b((granule >>> 32).toInt) ++
      le32b(77) ++ le32b(seq) ++ le32b(0) ++ // serial, page seq, zero CRC
      Array[Byte](1, payload.length.toByte) ++ payload
  }

  /** Ogg Vorbis: BOS page with the identification header, one data
    * page, an EOS page whose granule position is the PCM total. */
  def oggVorbis(sampleRate: Int, totalSamples: Long): Array[Byte] = {
    val id = Array[Byte](0x01) ++ cc("vorbis") ++ le32b(0) ++ Array[Byte](2) ++
      le32b(sampleRate) ++ le32b(0) ++ le32b(112000) ++ le32b(0) ++
      Array[Byte](0xb8.toByte, 0x01)
    oggPage(0x02, 0L, 0, id) ++
      oggPage(0x00, totalSamples / 2, 1, Array.tabulate[Byte](48)(i => (i * 29).toByte)) ++
      oggPage(0x04, totalSamples, 2, Array.tabulate[Byte](32)(i => (i * 13).toByte))
  }

  /** Ogg Opus: BOS page with OpusHead (pre-skip in 48 kHz ticks), a
    * data page, an EOS page; granule ticks are always 48 kHz. */
  def oggOpus(preSkip: Int, granule: Long): Array[Byte] = {
    val head = cc("OpusHead") ++ Array[Byte](1, 2) ++ le16b(preSkip) ++
      le32b(48000) ++ le16b(0) ++ Array[Byte](0)
    oggPage(0x02, 0L, 0, head) ++
      oggPage(0x00, granule / 2, 1, Array.tabulate[Byte](40)(i => (i * 59).toByte)) ++
      oggPage(0x04, granule, 2, Array.tabulate[Byte](24)(i => (i * 31).toByte))
  }

  private def mp4Box(tp: String, payload: Array[Byte]): Array[Byte] =
    be32b(payload.length + 8) ++ cc(tp) ++ payload

  // --- Matroska/WebM (EBML) builders ---------------------------------------

  private def ebmlIdBytes(id: Long): Array[Byte] = {
    // ids are stored with their marker bits; emit minimal big-endian
    val len = if (id <= 0xff) 1 else if (id <= 0xffff) 2 else if (id <= 0xffffff) 3 else 4
    (0 until len).map(k => ((id >> (8 * (len - 1 - k))) & 0xff).toByte).toArray
  }

  /** EBML size vint, always 2 bytes (0x4000 | n) — valid for n ≤ 16382. */
  private def ebmlSize(n: Int): Array[Byte] = {
    require(n >= 0 && n <= 16382, "fixture elements are 2-byte-size encoded")
    Array[Byte]((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
  }

  private def ebml(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlIdBytes(id) ++ ebmlSize(payload.length) ++ payload

  private def ebmlUint(id: Long, v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    ebml(id, (0 until len).map(k => ((v >> (8 * (len - 1 - k))) & 0xff).toByte).toArray)
  }

  private def ebmlFloat8(id: Long, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    ebml(id, (0 until 8).map(k => ((bits >> (8 * (7 - k))) & 0xff).toByte).toArray)
  }

  /** Matroska/WebM: EBML header with the DocType, a Segment with Info
    * (TimestampScale + float Duration), one video TrackEntry with the
    * real dimensions, and one Cluster with `frames` SimpleBlocks for
    * that track (plus one for a non-video track, which must NOT
    * count). */
  def mkv(docType: String, w: Int, h: Int, frames: Int, scaleNs: Long, durUnits: Double): Array[Byte] = {
    val header = ebml(0x1A45DFA3L, ebmlUint(0x4286L, 1) ++ ebml(0x4282L, cc(docType)))
    val info = ebml(0x1549A966L, ebmlUint(0x2AD7B1L, scaleNs) ++ ebmlFloat8(0x4489L, durUnits))
    val video = ebml(0xE0L, ebmlUint(0xB0L, w) ++ ebmlUint(0xBAL, h))
    val vTrack = ebml(0xAEL, ebmlUint(0xD7L, 1) ++ ebmlUint(0x83L, 1) ++ video)
    val aTrack = ebml(0xAEL, ebmlUint(0xD7L, 2) ++ ebmlUint(0x83L, 2)) // audio: no dims
    val tracks = ebml(0x1654AE6BL, vTrack ++ aTrack)
    def block(track: Int) = ebml(0xA3L,
      Array[Byte]((0x80 | track).toByte, 0, 0, 0) ++
        Array.tabulate[Byte](6)(i => ((i * 19 + track) & 0xff).toByte))
    val cluster = ebml(0x1F43B675L,
      ebmlUint(0xE7L, 0) ++ (0 until frames).flatMap(_ => block(1)).toArray ++ block(2))
    header ++ ebml(0x18538067L, info ++ tracks ++ cluster)
  }

  /** ISO-BMFF MP4: ftyp + moov(mvhd v0, trak(tkhd v0 with 16.16 dims,
    * mdia/minf/stbl/stts with two sample-count entries)). */
  def mp4(w: Int, h: Int, timescale: Int, durationUnits: Int, f1: Int, f2: Int): Array[Byte] = {
    val mvhd = mp4Box("mvhd",
      new Array[Byte](12) ++ be32b(timescale) ++ be32b(durationUnits) ++ new Array[Byte](80))
    val tkhd = mp4Box("tkhd", new Array[Byte](76) ++ be32b(w << 16) ++ be32b(h << 16))
    val stts = mp4Box("stts",
      new Array[Byte](4) ++ be32b(2) ++ be32b(f1) ++ be32b(100) ++ be32b(f2) ++ be32b(200))
    val trak = mp4Box("trak", tkhd ++ mp4Box("mdia", mp4Box("minf", mp4Box("stbl", stts))))
    mp4Box("ftyp", cc("isom") ++ be32b(0)) ++ mp4Box("moov", mvhd ++ trak)
  }

  // --- the fixture corpus ---------------------------------------------------

  /** 132 fixtures, 12 per kind; kind = i % 11. Kind 10 is a UTF-8 text
    * payload pinning the dispatch contract: unrecognized bytes take the
    * [[Multimodal.FakeDecoder]] fallback, whose formula is replicated
    * here independently (same arithmetic the m01 oracle uses). */
  lazy val fixtures: Seq[Fixture] = (0 until 132).map { i =>
    val id = 9000L + i
    val w = 16 + (i * 37) % 1200
    val h = 16 + (i * 53) % 900
    val frames = 1 + i % 6
    i % 11 match {
      case 0 => Fixture(id, png(w, h), "png", Some(w), Some(h), 1, 0L)
      case 1 => Fixture(id, jpeg(w, h), "jpeg", Some(w), Some(h), 1, 0L)
      case 2 => Fixture(id, gif(w, h, frames), "gif", Some(w), Some(h), frames, 0L)
      case 3 =>
        // rotate the three bitstream variants; only VP8X animates
        val (wv, hv) = (1 + w % 4000, 1 + h % 4000) // 14-bit dim space
        (i / 11) % 3 match {
          case 0 => Fixture(id, webpLossy(wv, hv), "webp", Some(wv), Some(hv), 1, 0L)
          case 1 => Fixture(id, webpLossless(wv, hv), "webp", Some(wv), Some(hv), 1, 0L)
          case _ =>
            val anmf = i % 5 // 0 ANMF chunks = a still, reads as 1 frame
            Fixture(id, webpExtended(wv, hv, anmf), "webp", Some(wv), Some(hv),
              math.max(anmf, 1), 0L)
        }
      case 4 =>
        val rate = Seq(8000, 16000, 44100)((i / 11) % 3)
        val channels = 1 + (i / 11) % 2
        val sampleFrames = 400 + i * 31
        val dataBytes = sampleFrames.toLong * 2 * channels
        Fixture(id, wav(rate, channels, sampleFrames), "wav", None, None,
          sampleFrames, dataBytes * 1000L / (rate.toLong * 2 * channels))
      case 5 =>
        val scale = 600 + (i % 5) * 200
        val durUnits = 1000 + i * 97
        val (f1, f2) = (1 + i % 9, 2 + i % 5)
        Fixture(id, mp4(w, h, scale, durUnits, f1, f2), "mp4", Some(w), Some(h),
          f1 + f2, durUnits.toLong * 1000L / scale)
      case 6 =>
        val version = Seq(1, 2, 25)((i / 11) % 3)
        val bitrateIdx = 1 + i % 14
        val rateIdx = (i / 11) % 3
        val nf = 2 + i % 6
        val id3 = if (i % 3 == 0) 40 + i else 0
        val (rate, spf, _) = mp3Geometry(version, bitrateIdx, rateIdx)
        // the parser accumulates exact per-frame microseconds; with one
        // geometry the total is nf × the per-frame division
        Fixture(id, mp3(version, bitrateIdx, rateIdx, nf, id3), "mp3", None, None,
          nf, nf.toLong * (spf * 1000000L / rate) / 1000L)
      case 7 =>
        val rate = Seq(8000, 22050, 44100, 96000)((i / 11) % 4)
        val total = 10000L + i * 977L
        Fixture(id, flac(rate, total), "flac", None, None,
          math.min(total, Int.MaxValue.toLong).toInt, total * 1000L / rate)
      case 8 =>
        if ((i / 11) % 2 == 0) {
          val rate = Seq(8000, 44100, 48000)(i % 3)
          val total = 5000L + i * 331L
          Fixture(id, oggVorbis(rate, total), "vorbis", None, None,
            total.toInt, total * 1000L / rate)
        } else {
          val preSkip = 312
          val pcm = 960L * (10 + i % 50)
          Fixture(id, oggOpus(preSkip, preSkip + pcm), "opus", None, None,
            pcm.toInt, pcm * 1000L / 48000L)
        }
      case 9 =>
        val docType = if ((i / 11) % 2 == 0) "webm" else "matroska"
        val scaleNs = Seq(1000000L, 500000L, 2000000L)(i % 3)
        val durUnits = 900.0 + i * 13.25 // dyadic fraction: exact in float8
        val nf = 1 + i % 7
        Fixture(id, mkv(docType, w, h, nf, scaleNs, durUnits),
          if (docType == "webm") "webm" else "mkv", Some(w), Some(h), nf,
          math.floor(durUnits * scaleNs / 1000000.0).toLong)
      case _ =>
        val payload = s"fixture text payload $i padding ${"x" * (i % 13)}".getBytes("UTF-8")
        val n = payload.length.toLong
        val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
        Fixture(id, payload, fmt, Some((64 + n % 1856).toInt), Some((64 + (n * 7) % 1016).toInt),
          (1 + n % 30).toInt, n * 40 % 600000)
    }
  }

  /** (media_id, payload) fixture table — the [[Multimodal.decodeMetadata]]
    * input shape. A 132-row local relation: this is a correctness gate,
    * not a scale path (the scale path is [[Multimodal.readBinaryDir]]). */
  def table(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fixtures.map(f => (f.mediaId, f.payload)).toDF("media_id", "payload")
  }

  /** DuckDB twin: the pinned expectations as a VALUES literal, column
    * names and types matched to [[Multimodal.decodeMetadata]] output. */
  def oracleSql: String = {
    val rows = fixtures.map { f =>
      val wv = f.width.map(_.toString).getOrElse("NULL")
      val hv = f.height.map(_.toString).getOrElse("NULL")
      s"(${f.mediaId},${f.byteLen},'${f.format}',$wv,$hv,${f.nFrames},${f.durationMs})"
    }.mkString(",")
    s"""SELECT CAST(media_id AS BIGINT) AS media_id, CAST(byte_len AS BIGINT) AS byte_len,
       |format, CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
       |CAST(n_frames AS INTEGER) AS n_frames, CAST(duration_ms AS BIGINT) AS duration_ms
       |FROM (VALUES $rows)
       |AS t(media_id, byte_len, format, width, height, n_frames, duration_ms)""".stripMargin
  }
}
