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
