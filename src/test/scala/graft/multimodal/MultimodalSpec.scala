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
