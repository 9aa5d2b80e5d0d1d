package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec
import javax.imageio.ImageIO

/** [[Multimodal.ImageHeader]] against REAL image bytes — encoded by the
  * JDK's own ImageIO (independent codec), parsed by our stdlib header
  * walk, dimensions compared. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  test("ImageHeader parses ImageIO-encoded PNG, JPEG and GIF dimensions") {
    for (fmt <- Seq("png", "jpeg", "gif")) {
      assert(Multimodal.ImageHeader.parse(encode(fmt, 37, 23)) == Some((fmt, 37, 23)), fmt)
      assert(Multimodal.ImageHeader.parse(encode(fmt, 640, 480)) == Some((fmt, 640, 480)), fmt)
    }
  }

  test("ImageHeader rejects non-image and truncated payloads without throwing") {
    assert(Multimodal.ImageHeader.parse("plain text payload".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.ImageHeader.parse(Array.emptyByteArray).isEmpty)
    val png = encode("png", 10, 10)
    assert(Multimodal.ImageHeader.parse(png.take(12)).isEmpty) // cut inside the signature/IHDR
    val jpg = encode("jpeg", 10, 10)
    assert(Multimodal.ImageHeader.parse(jpg.take(4)).isEmpty) // SOI only, no SOF reachable
  }

  test("WavHeader parses a JDK-written WAV's frame count and duration exactly") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    // 1 second of 16-bit mono PCM at 8 kHz = 8000 frames, 16000 data bytes
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](16000)
    pcm.indices.foreach(i => pcm(i) = ((i * 37) & 0xff).toByte)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 8000)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    assert(Multimodal.WavHeader.parse(wav) == Some((8000L, 1000L)))
    assert(Multimodal.WavHeader.parse(wav.take(30)).isEmpty) // truncated header
    assert(Multimodal.WavHeader.parse("RIFFnope".getBytes("UTF-8")).isEmpty)
    // a fmt chunk declaring size < 16 has no byteRate/blockAlign fields;
    // fixed-offset reads would land in the next chunk — must be None
    val shortFmt = wav.clone()
    shortFmt(16) = 8 // fmt chunk size LE byte 0: 16 -> 8
    assert(Multimodal.WavHeader.parse(shortFmt).isEmpty)
    // and the decode path reports it as real audio metadata
    val row = Multimodal.decodeOne(7L, wav)
    assert(row.getAs[String](2) == "wav")
    assert(row.get(3) == null && row.get(4) == null) // no width/height for audio
    assert(row.getAs[Int](5) == 8000 && row.getAs[Long](6) == 1000L)
  }

  test("gifFrameCount walks an animated GIF's image descriptors") {
    import javax.imageio.stream.MemoryCacheImageOutputStream
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 3).foreach { k =>
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(x => (0 until 8).foreach(y => img.setRGB(x, y, k * 80 + x)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    val gif = bos.toByteArray
    assert(Multimodal.ImageHeader.gifFrameCount(gif) == Some(3))
    assert(Multimodal.decodeOne(9L, gif).getAs[Int](5) == 3) // n_frames
    // a single-frame GIF still reports 1
    assert(Multimodal.ImageHeader.gifFrameCount(encode("gif", 5, 5)) == Some(1))
  }

  // --- WebP / MP4: the JDK ships no writers, so the fixtures are
  // hand-built to the public container specs --------------------------------

  private def le16b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le24b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte)
  private def le32b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def be32b(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def riffChunk(cc: String, payload: Array[Byte]): Array[Byte] =
    cc.getBytes("ISO-8859-1") ++ le32b(payload.length) ++ payload ++
      (if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)

  private def webpFile(chunks: Array[Byte]*): Array[Byte] = {
    val body = "WEBP".getBytes("ISO-8859-1") ++ chunks.flatten
    "RIFF".getBytes("ISO-8859-1") ++ le32b(body.length) ++ body
  }

  test("ImageHeader parses all three WebP bitstream variants") {
    // VP8 lossy: 3-byte frame tag, start code 9D 01 2A, 14-bit LE dims
    val vp8 = webpFile(riffChunk("VP8 ",
      Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++ le16b(320) ++ le16b(240)))
    assert(Multimodal.ImageHeader.parse(vp8) == Some(("webp", 320, 240)))
    // VP8L lossless: 0x2F, then (w-1) | (h-1) << 14, LE
    val bits = (37 - 1) | ((23 - 1) << 14)
    val vp8l = webpFile(riffChunk("VP8L", Array[Byte](0x2f) ++ le32b(bits)))
    assert(Multimodal.ImageHeader.parse(vp8l) == Some(("webp", 37, 23)))
    // VP8X extended: flags(1) reserved(3), 24-bit LE canvas w-1 / h-1
    val vp8x = webpFile(riffChunk("VP8X",
      Array[Byte](0x02, 0, 0, 0) ++ le24b(640 - 1) ++ le24b(480 - 1)))
    assert(Multimodal.ImageHeader.parse(vp8x) == Some(("webp", 640, 480)))
    // truncated / non-WebP RIFF stays unrecognized
    assert(Multimodal.ImageHeader.parse(vp8.take(20)).isEmpty)
    assert(Multimodal.ImageHeader.parse("RIFF1234WAVE".getBytes("ISO-8859-1")).isEmpty)
  }

  test("animated WebP reports its ANMF frame count through decodeOne") {
    val vp8x = riffChunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++ le24b(15) ++ le24b(15))
    val anim = webpFile(vp8x, riffChunk("ANMF", new Array[Byte](16)),
      riffChunk("ANMF", new Array[Byte](16)), riffChunk("ANMF", new Array[Byte](17)))
    assert(Multimodal.ImageHeader.webpFrameCount(anim) == Some(3))
    val row = Multimodal.decodeOne(11L, anim)
    assert(row.getAs[String](2) == "webp" && row.getAs[Int](5) == 3)
    // a still (no ANMF chunks) falls back to 1 frame
    assert(Multimodal.decodeOne(12L, webpFile(vp8x)).getAs[Int](5) == 1)
  }

  private def mp4Box(tp: String, payload: Array[Byte]): Array[Byte] =
    be32b(payload.length + 8) ++ tp.getBytes("ISO-8859-1") ++ payload

  test("Mp4Header walks ftyp/moov boxes for dims, duration and frame count") {
    // mvhd v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4) + 80 pad
    val mvhd = mp4Box("mvhd",
      new Array[Byte](12) ++ be32b(1000) ++ be32b(2500) ++ new Array[Byte](80))
    // tkhd v0: 76 bytes to the 16.16 width/height
    val tkhd = mp4Box("tkhd",
      new Array[Byte](76) ++ be32b(320 << 16) ++ be32b(240 << 16))
    // stts: ver/flags(4) entryCount(4) then (count, delta) pairs: 10+5 frames
    val stts = mp4Box("stts",
      new Array[Byte](4) ++ be32b(2) ++ be32b(10) ++ be32b(100) ++ be32b(5) ++ be32b(200))
    val trak = mp4Box("trak", tkhd ++ mp4Box("mdia", mp4Box("minf", mp4Box("stbl", stts))))
    // an audio-ish trak with zero dims must be skipped, not picked
    val audioTrak = mp4Box("trak", mp4Box("tkhd", new Array[Byte](84)))
    val mp4 = mp4Box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32b(0)) ++
      mp4Box("moov", mvhd ++ audioTrak ++ trak)
    assert(Multimodal.Mp4Header.parse(mp4) == Some((320, 240, 2500L, 15)))
    val row = Multimodal.decodeOne(13L, mp4)
    assert(row.getAs[String](2) == "mp4")
    assert(row.getAs[Int](3) == 320 && row.getAs[Int](4) == 240)
    assert(row.getAs[Int](5) == 15 && row.getAs[Long](6) == 2500L)
    // truncation and non-MP4 payloads read as "not a video", never throw
    assert(Multimodal.Mp4Header.parse(mp4.take(40)).isEmpty)
    assert(Multimodal.Mp4Header.parse("plain text".getBytes("UTF-8")).isEmpty)
  }

  test("corrupt sizes and fragmented MP4s never throw and never emit 0 frames") {
    // animated WebP whose ANMF chunk declares a near-Int.MaxValue size:
    // the cursor must read it as a truncated tail, not wrap negative
    val vp8x = riffChunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++ le24b(15) ++ le24b(15))
    val evil = webpFile(vp8x, riffChunk("ANMF", new Array[Byte](16)))
    System.arraycopy(le32b(0x7fffffe0), 0, evil, 34, 4) // ANMF size field
    assert(Multimodal.ImageHeader.webpFrameCount(evil) == Some(1))
    // fragmented-style MP4: stts with entryCount 0 (samples live in
    // moof fragments) ending exactly at the buffer end — must fall
    // back to 1 frame, never 0 (sequence(0, -1) throws downstream)
    val mvhd = mp4Box("mvhd",
      new Array[Byte](12) ++ be32b(1000) ++ be32b(2500) ++ new Array[Byte](80))
    val tkhd = mp4Box("tkhd",
      new Array[Byte](76) ++ be32b(320 << 16) ++ be32b(240 << 16))
    val ftyp = mp4Box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32b(0))
    def withStts(stts: Array[Byte]) = ftyp ++ mp4Box("moov",
      mvhd ++ mp4Box("trak", tkhd ++ mp4Box("mdia", mp4Box("minf", mp4Box("stbl", stts)))))
    val empty = withStts(mp4Box("stts", new Array[Byte](4) ++ be32b(0)))
    assert(Multimodal.Mp4Header.parse(empty) == Some((320, 240, 2500L, 1)))
    // header-only stts (declared size 8, zero payload) at the very
    // end of the buffer — the entry count must not be read past it
    val headerOnly = withStts(be32b(8) ++ "stts".getBytes("ISO-8859-1"))
    assert(Multimodal.Mp4Header.parse(headerOnly) == Some((320, 240, 2500L, 1)))
  }

  test("decodeMetadata takes the real path for images and falls back for text") {
    val png = encode("png", 320, 200)
    val media = Seq((1L, png), (2L, "not an image".getBytes("UTF-8"))).toDF("media_id", "payload")
    val out = Multimodal.decodeMetadata(media).collect().map(r => r.getLong(0) -> r).toMap
    val real = out(1L)
    assert(real.getAs[String]("format") == "png")
    assert(real.getAs[Int]("width") == 320 && real.getAs[Int]("height") == 200)
    assert(real.getAs[Long]("byte_len") == png.length.toLong)
    // the text payload still gets the deterministic fallback metadata
    val fake = out(2L)
    assert(fake == Multimodal.FakeDecoder.decode(2L, "not an image".getBytes("UTF-8")))
  }
}
