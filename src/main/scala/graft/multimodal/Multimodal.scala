package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The decode step is REAL for images, WAV/MP3/FLAC/Ogg audio and MP4
  * video:
  * [[ImageHeader]] detects PNG/JPEG/GIF/WebP by magic bytes and parses
  * width/height from the format's header (IHDR / SOFn / logical screen
  * descriptor / VP8 bitstream chunks), plus the true frame count for
  * animated GIFs and WebPs; [[WavHeader]] walks the RIFF chunks for
  * exact sample-frame count and duration; [[Mp3Header]] walks MPEG
  * Layer III frame headers (ID3-aware, VBR-correct) for frame count
  * and duration; [[FlacHeader]] reads the STREAMINFO block's packed
  * sample geometry; [[OggHeader]] walks Ogg pages to the final granule
  * position with Vorbis/Opus identification-header dispatch;
  * [[Mp4Header]] walks the ISO BMFF boxes for the video
  * track's dimensions, movie duration and `stts` frame count;
  * [[MkvHeader]] walks Matroska/WebM EBML elements for the video
  * track's dimensions, the Info duration and the per-track
  * SimpleBlock count — all
  * stdlib byte arithmetic, no external codecs. Payloads that are none
  * of these (the synthetic fixtures' UTF-8 text) fall back
  * to [[FakeDecoder]]'s deterministic pseudo-metadata, keeping the
  * fixture oracles exact. The plumbing — the binary column schema, the
  * batched `mapPartitions` shape (the Scala equivalent of
  * `mapInPandas`: an iterator-of-batches UDF that never materializes a
  * partition), the typed output struct, and partition sizing — is
  * shared by both paths.
  *
  * Scale notes: binary payloads dominate row width, so the operator (a)
  * keeps the decode in a narrow `mapPartitions` (no shuffle), (b)
  * projects metadata out BEFORE any wide operation, and (c) repartitions
  * by byte budget, not row count, when payloads are skewed.
  */
object Multimodal {

  /** Typed metadata produced by the decoder. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType)
  ))

  /** Shared byte readers for the header parsers — ONE copy of the
    * endian arithmetic so an overflow/bounds fix cannot drift between
    * formats. */
  private object Bytes {
    def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    def le24(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
    def le32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong) | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
    def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    def be64(b: Array[Byte], i: Int): Long = (be32(b, i) << 32) | be32(b, i + 4)
    def fourCC(b: Array[Byte], i: Int, s: String): Boolean =
      b(i) == s(0) && b(i + 1) == s(1) && b(i + 2) == s(2) && b(i + 3) == s(3)
  }

  /** Real image header parser: format + dimensions for PNG / JPEG /
    * GIF / WebP from the raw bytes, stdlib only. Used by
    * [[decodeMetadata]] for any payload whose magic bytes identify one
    * of the four formats; returns None otherwise (never throws — a
    * truncated or corrupt header reads as "not an image" and falls
    * back). */
  object ImageHeader {
    import Bytes._

    /** (format, width, height), or None if not a parsable
      * PNG/JPEG/GIF/WebP. */
    def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
      def png: Option[(String, Int, Int)] =
        // 8-byte signature, then the IHDR chunk: len(4) "IHDR" w(4 BE) h(4 BE)
        if (b.length >= 24 &&
          u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
          u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
          val (w, h) = (be32(b, 16), be32(b, 20))
          if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
            Some(("png", w.toInt, h.toInt)) else None
        } else None
      def gif: Option[(String, Int, Int)] =
        // "GIF87a"/"GIF89a", then the logical screen descriptor (LE u16 × 2)
        if (b.length >= 10 &&
          b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
          (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
          val (w, h) = (le16(b, 6), le16(b, 8))
          if (w > 0 && h > 0) Some(("gif", w, h)) else None
        } else None
      def jpeg: Option[(String, Int, Int)] =
        if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
          // walk the marker segments to the first SOFn frame header:
          // [FF marker][len(2 BE)] ... SOFn payload = precision(1) h(2) w(2)
          var i = 2
          while (i + 3 < b.length && u8(b, i) == 0xff) {
            val marker = u8(b, i + 1)
            if (marker == 0xff) i += 1 // fill byte
            else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) i += 2 // standalone
            else {
              val len = be16(b, i + 2)
              if (len < 2) return None
              val isSof = marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc
              if (isSof) {
                if (i + 9 >= b.length) return None
                val (h, w) = (be16(b, i + 5), be16(b, i + 7))
                return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
              }
              i += 2 + len
            }
          }
          None
        } else None
      def webp: Option[(String, Int, Int)] =
        // RIFF container: "RIFF" size "WEBP", then one of the three
        // bitstream chunks. Dimensions per the public container spec:
        //   VP8  (lossy)    — 3-byte frame tag, start code 9D 01 2A,
        //                     then 14-bit LE width / height
        //   VP8L (lossless) — 0x2F, then w-1 (14 bits) | h-1 << 14, LE
        //   VP8X (extended) — flags(1) reserved(3), then 24-bit LE
        //                     canvas w-1 / h-1
        if (b.length >= 25 && fourCC(b, 0, "RIFF") && fourCC(b, 8, "WEBP")) {
          if (b.length >= 30 && fourCC(b, 12, "VP8 ") &&
            u8(b, 23) == 0x9d && u8(b, 24) == 0x01 && u8(b, 25) == 0x2a) {
            val (w, h) = (le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff)
            if (w > 0 && h > 0) Some(("webp", w, h)) else None
          } else if (fourCC(b, 12, "VP8L") && u8(b, 20) == 0x2f) {
            val bits = le32(b, 21)
            Some(("webp", (bits & 0x3fff).toInt + 1, ((bits >> 14) & 0x3fff).toInt + 1))
          } else if (b.length >= 30 && fourCC(b, 12, "VP8X")) {
            Some(("webp", le24(b, 24) + 1, le24(b, 27) + 1))
          } else None
        } else None
      png.orElse(gif).orElse(jpeg).orElse(webp)
    }

    /** Frame count of an animated (VP8X) WebP: one ANMF chunk per
      * frame; a still (or a walk that runs off the end) reports None
      * and the caller falls back to 1. */
    def webpFrameCount(b: Array[Byte]): Option[Int] = {
      if (b.length < 30 || !fourCC(b, 0, "RIFF") || !fourCC(b, 8, "WEBP")) return None
      var i = 12
      var frames = 0
      while (i + 8 <= b.length) {
        if (fourCC(b, i, "ANMF")) frames += 1
        // advance in Long: a corrupt declared size near Int.MaxValue
        // must read as "truncated tail", not wrap the cursor negative
        val size = le32(b, i + 4)
        val next = i.toLong + 8L + size + (size & 1L) // chunks are word-aligned
        if (next > b.length) i = b.length else i = next.toInt
      }
      if (frames > 0) Some(frames) else None
    }

    /** Frame count of a GIF: walks the block stream counting image
      * descriptors (animated GIFs have one per frame). None when the
      * walk runs off the end before the trailer — the caller falls
      * back to 1 (a still). */
    def gifFrameCount(b: Array[Byte]): Option[Int] = {
      if (b.length < 14 || !(b(0) == 'G' && b(1) == 'I' && b(2) == 'F')) return None
      // logical screen descriptor: packed field bit 7 = global color
      // table present, bits 0-2 = its size as 2^(n+1) 3-byte entries
      val packed = u8(b, 10)
      var i = 13 + (if ((packed & 0x80) != 0) 3 * (1 << ((packed & 0x07) + 1)) else 0)
      def skipSubBlocks(): Boolean = {
        while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
        if (i < b.length) { i += 1; true } else false // the 0x00 block terminator
      }
      var frames = 0
      while (i < b.length) {
        u8(b, i) match {
          case 0x3b => return Some(frames) // trailer
          case 0x21 => // extension: label byte, then sub-blocks
            i += 2
            if (!skipSubBlocks()) return None
          case 0x2c => // image descriptor (+ optional local color table)
            if (i + 10 > b.length) return None
            val p = u8(b, i + 9)
            i += 10 + (if ((p & 0x80) != 0) 3 * (1 << ((p & 0x07) + 1)) else 0)
            i += 1 // LZW minimum code size
            if (!skipSubBlocks()) return None
            frames += 1
          case _ => return None // corrupt stream
        }
      }
      None
    }
  }

  /** Real audio header parser: WAV/RIFF format + sample geometry +
    * exact duration, stdlib only. Same contract as [[ImageHeader]]:
    * None (never a throw) for anything that isn't a parsable WAV. */
  object WavHeader {
    import Bytes._

    /** (sampleFrames, durationMs), from the fmt and data chunks. */
    def parse(b: Array[Byte]): Option[(Long, Long)] = {
      if (b.length < 44 || !fourCC(b, 0, "RIFF") || !fourCC(b, 8, "WAVE")) return None
      var i = 12
      var byteRate = 0L
      var blockAlign = 0
      var dataSize = -1L
      while (i + 8 <= b.length && (byteRate == 0 || dataSize < 0)) {
        val size = le32(b, i + 4)
        if (fourCC(b, i, "fmt ")) {
          // byteRate/blockAlign sit at fmt offsets 8/12 — a declared
          // size under 16 means those fields don't exist and fixed-
          // offset reads would land in the NEXT chunk's bytes
          if (size < 16 || i + 24 > b.length) return None
          byteRate = le32(b, i + 16)
          blockAlign = le16(b, i + 20)
        } else if (fourCC(b, i, "data")) {
          // size may overrun a truncated buffer; clamp to what's present
          dataSize = math.min(size, (b.length - i - 8).toLong)
        }
        // advance in Long: a corrupt declared size near Int.MaxValue
        // must read as "truncated tail", not wrap the cursor negative
        val next = i.toLong + 8L + size + (size & 1L) // chunks are word-aligned
        if (next > b.length) i = b.length else i = next.toInt
      }
      if (byteRate <= 0 || blockAlign <= 0 || dataSize < 0) None
      else Some((dataSize / blockAlign, dataSize * 1000L / byteRate))
    }

  }

  /** Real compressed-audio parser: MPEG-1/2/2.5 Layer III (MP3) frame
    * walk, stdlib only. Same contract as the other header parsers:
    * None (never a throw) for anything that isn't a parsable MP3
    * stream. Skips a leading ID3v2 tag (syncsafe size), then walks
    * frame headers — sync bits, version/layer, the public bitrate and
    * sample-rate tables — summing exact per-frame durations; frame
    * count × frame geometry handles VBR streams naturally. A truncated
    * final frame ends the walk cleanly (the partial frame doesn't
    * count); an ID3v1 "TAG" trailer ends it cleanly; any other
    * mid-stream garbage rejects the whole payload (it wasn't an MP3).
    * To keep the 2-byte sync from false-positives on arbitrary binary,
    * a stream with no ID3 tag must open with at least TWO back-to-back
    * valid frames. */
  object Mp3Header {
    import Bytes._

    // Layer III bitrate (kbps) and sample-rate tables, by version
    private val bitrateV1 =
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    private val bitrateV2 =
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
    private val ratesV1 = Array(44100, 48000, 32000)
    private val ratesV2 = Array(22050, 24000, 16000)
    private val ratesV25 = Array(11025, 12000, 8000)

    /** (frameBytes, samplesPerFrame, sampleRate) of the Layer III
      * frame at `i`, or None if the 4 header bytes aren't one. */
    private def frameAt(b: Array[Byte], i: Int): Option[(Int, Int, Int)] = {
      val h = be32(b, i)
      if (((h >>> 21) & 0x7ff) != 0x7ff) return None // 11-bit sync
      val version = ((h >>> 19) & 3).toInt // 0=2.5, 1=reserved, 2=v2, 3=v1
      val layer = ((h >>> 17) & 3).toInt // 1=III
      val bitrateIdx = ((h >>> 12) & 0xf).toInt // 0=free, 15=bad
      val rateIdx = ((h >>> 10) & 3).toInt // 3=reserved
      val padding = ((h >>> 9) & 1).toInt
      if (version == 1 || layer != 1 || bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3)
        return None
      val v1 = version == 3
      val bitrate = (if (v1) bitrateV1 else bitrateV2)(bitrateIdx) * 1000
      val rate = (if (v1) ratesV1 else if (version == 2) ratesV2 else ratesV25)(rateIdx)
      val spf = if (v1) 1152 else 576
      Some((spf / 8 * bitrate / rate + padding, spf, rate))
    }

    /** (nFrames, durationMs), or None if not a parsable MP3. */
    def parse(b: Array[Byte]): Option[(Int, Long)] = {
      var i = 0
      var hadId3 = false
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        // ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4), then the tag
        val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) | ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
        val next = 10L + size // corrupt sizes must not wrap the cursor
        if (next > b.length) return None
        i = next.toInt
        hadId3 = true
      }
      var frames = 0
      var durUs = 0L
      while (i + 4 <= b.length) {
        frameAt(b, i) match {
          case Some((size, spf, rate)) =>
            if (i + size > b.length) i = b.length // truncated final frame
            else { frames += 1; durUs += spf * 1000000L / rate; i += size }
          case None =>
            // an ID3v1 trailer ends the stream cleanly; anything else
            // means this was never an MP3
            if (i + 3 <= b.length && b(i) == 'T' && b(i + 1) == 'A' && b(i + 2) == 'G') i = b.length
            else return None
        }
      }
      if (frames >= 2 || (hadId3 && frames >= 1)) Some((frames, durUs / 1000)) else None
    }
  }

  /** Real lossless-compressed-audio parser: FLAC STREAMINFO, stdlib
    * only. Same contract as the other header parsers: None (never a
    * throw) for anything that isn't a parsable FLAC. After the "fLaC"
    * magic, metadata blocks follow — 1-byte header (bit 7 = last,
    * bits 0-6 = type) + 24-bit BE length. STREAMINFO (type 0, 34
    * bytes) must come first per the public spec; its packed tail
    * carries sample rate (20 bits), channels-1 (3), bits-per-sample-1
    * (5) and the 36-bit total inter-channel sample count — everything
    * duration needs, no frame decoding. */
  object FlacHeader {
    import Bytes._

    /** (sampleFrames, durationMs), from the STREAMINFO block. */
    def parse(b: Array[Byte]): Option[(Long, Long)] = {
      if (b.length < 42 || !fourCC(b, 0, "fLaC")) return None
      // first block header at 4; STREAMINFO must be first (type 0)
      if ((u8(b, 4) & 0x7f) != 0) return None
      val len = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
      if (len < 34 || 8 + len > b.length) return None
      val s = 8 // STREAMINFO payload start
      // packed 64 bits at offset 10: rate(20) ch-1(3) bps-1(5) total(36)
      val rate = (u8(b, s + 10) << 12) | (u8(b, s + 11) << 4) | (u8(b, s + 12) >> 4)
      val total = ((u8(b, s + 13) & 0x0f).toLong << 32) |
        (u8(b, s + 14).toLong << 24) | (u8(b, s + 15) << 16) |
        (u8(b, s + 16) << 8) | u8(b, s + 17)
      // rate 0 is spec-invalid; total 0 means "unknown" — reject both
      // (duration would be a lie) and let the caller fall back
      if (rate <= 0 || total <= 0) None
      else Some((total, total * 1000L / rate))
    }
  }

  /** Real Ogg container parser: page walk + Vorbis/Opus identification
    * header, stdlib only. Same contract as the other header parsers:
    * None (never a throw) for anything that isn't a parsable Ogg
    * stream. The first page's payload identifies the codec (the public
    * `vorbis` / `OpusHead` signatures) and carries the sample
    * rate; duration comes from the LAST page's granule position — PCM
    * sample count for Vorbis, 48 kHz ticks minus pre-skip for Opus —
    * so the walk reads 27-byte page headers and segment tables only,
    * never codec payload past page one. A mid-stream non-"OggS" byte
    * or a truncated final page ends the walk, keeping the last
    * complete page's granule (truncation semantics, like the RIFF and
    * ISO-BMFF walks); an unrecognized first-page codec rejects the
    * payload. */
  object OggHeader {
    import Bytes._

    /** (codec, sampleFrames, durationMs) with codec "vorbis"|"opus". */
    def parse(b: Array[Byte]): Option[(String, Long, Long)] = {
      if (b.length < 28 || !fourCC(b, 0, "OggS") || u8(b, 4) != 0) return None
      var i = 0
      var lastGranule = -1L
      var first = true
      var codec: String = null
      var rate = 0L
      var preSkip = 0L
      while (i + 27 <= b.length && fourCC(b, i, "OggS")) {
        val granule = le32(b, i + 6) | (le32(b, i + 10) << 32)
        val nSegs = u8(b, i + 26)
        if (i + 27 + nSegs > b.length) { i = b.length } // truncated table
        else {
          var payload = 0
          var k = 0
          while (k < nSegs) { payload += u8(b, i + 27 + k); k += 1 }
          val next = i.toLong + 27L + nSegs + payload
          if (first) {
            val p = i + 27 + nSegs // first page's payload = id header
            if (p + 30 <= b.length && u8(b, p) == 0x01 && fourCC(b, p + 1, "vorb") &&
              b(p + 5) == 'i' && b(p + 6) == 's') {
              codec = "vorbis"
              rate = le32(b, p + 12) // version(4) channels(1) rate(4 LE)
            } else if (p + 19 <= b.length && fourCC(b, p, "Opus") && fourCC(b, p + 4, "Head")) {
              codec = "opus"
              rate = 48000L // granule ticks are 48 kHz regardless of input rate
              preSkip = le16(b, p + 10)
            } else return None
            first = false
          }
          // granule -1 marks a page with no completed packet; skip it
          if (granule >= 0 && next <= b.length) lastGranule = granule
          if (next > b.length) i = b.length else i = next.toInt
        }
      }
      if (codec == null || rate <= 0 || lastGranule < 0) None
      else {
        val frames = math.max(0L, lastGranule - preSkip)
        Some((codec, frames, frames * 1000L / rate))
      }
    }
  }

  /** Real video container parser: ISO BMFF (MP4/MOV) box walk, stdlib
    * only. Same contract as the other header parsers: None (never a
    * throw) for anything that isn't a parsable MP4. Reads the movie
    * header for exact duration, the first video track's `tkhd` for
    * dimensions (16.16 fixed point), and that track's `stts` sample
    * table for the true frame count. */
  object Mp4Header {
    import Bytes._
    private def tp(b: Array[Byte], i: Int): String = new String(b, i + 4, 4, "ISO-8859-1")

    /** (boxType, payloadStart, payloadEnd) for each box in [from, to).
      * Stops (returns what it has) at the first malformed size. */
    private def boxes(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var i = from
      var ok = true
      while (ok && i + 8 <= to) {
        val size32 = be32(b, i)
        val (size, hdr) =
          if (size32 == 1 && i + 16 <= to) (be64(b, i + 8), 16L)
          else if (size32 == 0) ((to - i).toLong, 8L) // "to end of file"
          else (size32, 8L)
        if (size < hdr || i + size > to) ok = false
        else {
          out += ((tp(b, i), i + hdr.toInt, i + size.toInt))
          i += size.toInt
        }
      }
      out.result()
    }

    private def find(b: Array[Byte], from: Int, to: Int, t: String): Option[(Int, Int)] =
      boxes(b, from, to).collectFirst { case (`t`, s, e) => (s, e) }

    /** (width, height, durationMs, nFrames), or None. */
    def parse(b: Array[Byte]): Option[(Int, Int, Long, Int)] = {
      if (b.length < 16 || !"ftyp".equals(tp(b, 0))) return None
      val (moovS, moovE) = find(b, 0, b.length, "moov").getOrElse(return None)
      // movie header: v0 = u32 timescale@12 / duration@16; v1 = u64s
      val durMs = find(b, moovS, moovE, "mvhd").flatMap { case (s, e) =>
        val v = if (e > s) u8(b, s) else return None
        val (scale, dur) =
          if (v == 1 && s + 32 <= e) (be32(b, s + 20), be64(b, s + 24))
          else if (v == 0 && s + 20 <= e) (be32(b, s + 12), be32(b, s + 16))
          else return None
        if (scale <= 0) None else Some(dur * 1000L / scale)
      }.getOrElse(return None)
      // first trak whose tkhd carries nonzero 16.16 dimensions = video
      // (one tkhd walk per trak; stts only for the winner)
      boxes(b, moovS, moovE).iterator.flatMap {
        case ("trak", ts, te) =>
          tkhdDims(b, ts, te).collect { case (w, h) if w > 0 && h > 0 =>
            (w, h, durMs, sttsFrames(b, ts, te).getOrElse(1))
          }
        case _ => None
      }.nextOption()
    }

    private def tkhdDims(b: Array[Byte], ts: Int, te: Int): Option[(Int, Int)] =
      find(b, ts, te, "tkhd").flatMap { case (s, e) =>
        val v = if (e > s) u8(b, s) else return None
        val off = if (v == 1) 88 else 76 // v1: ctime/mtime/duration are u64
        if (s + off + 8 > e) None
        else Some(((be32(b, s + off) >> 16).toInt, (be32(b, s + off + 4) >> 16).toInt))
      }

    /** Sum of the trak's stts sample counts, in Long. None (caller
      * falls back to 1 frame) when the box is missing, truncated,
      * empty — fragmented MP4s legitimately declare entryCount 0 in
      * the moov, their samples live in moof fragments — or when a
      * corrupt count would not fit an Int. */
    private def sttsFrames(b: Array[Byte], ts: Int, te: Int): Option[Int] =
      for {
        (ms, me) <- find(b, ts, te, "mdia")
        (ns, ne) <- find(b, ms, me, "minf")
        (ss, se) <- find(b, ns, ne, "stbl")
        (xs, xe) <- find(b, ss, se, "stts")
        if xs + 8 <= xe // version/flags + entryCount present
        n = be32(b, xs + 4).toInt
        if n > 0 && xs + 8 + 8L * n <= xe
        frames = (0 until n).map(k => be32(b, xs + 8 + 8 * k)).sum
        if frames > 0 && frames <= Int.MaxValue
      } yield frames.toInt
  }

  /** Real Matroska/WebM container parser: EBML element walk, stdlib
    * only. Same contract as the other header parsers: None (never a
    * throw) for anything that isn't parsable. The EBML header's
    * DocType picks the format string ("webm" vs "mkv"); the Segment's
    * Info element carries TimestampScale (ns per unit, default 1e6)
    * and Duration (float, in units); the first video TrackEntry
    * carries PixelWidth/PixelHeight; the frame count is the number of
    * SimpleBlocks addressed to that track across Clusters — block
    * HEADERS only, codec payloads are never decoded. Truncated or
    * malformed elements end the walk with what was parsed (the RIFF /
    * ISO-BMFF truncation semantics); a missing video track rejects the
    * payload (audio-only WebM falls back). */
  object MkvHeader {
    import Bytes._

    /** (value-with-marker, length) of the EBML id at `i`, or None. */
    private def readId(b: Array[Byte], i: Int): Option[(Long, Int)] = {
      if (i >= b.length) return None
      val first = u8(b, i)
      if (first == 0) return None
      val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8 for first in [1,255]
      if (len < 1 || len > 4 || i + len > b.length) return None
      var v = 0L
      var k = 0
      while (k < len) { v = (v << 8) | u8(b, i + k); k += 1 }
      Some((v, len))
    }

    /** (size, length) of the EBML size vint at `i` (marker stripped);
      * all-ones ("unknown size") reads as -1. */
    private def readSize(b: Array[Byte], i: Int): Option[(Long, Int)] = {
      if (i >= b.length) return None
      val first = u8(b, i)
      if (first == 0) return None
      val len = Integer.numberOfLeadingZeros(first) - 23
      if (len < 1 || len > 8 || i + len > b.length) return None
      var v = (first & (0xff >>> len)).toLong
      var k = 1
      while (k < len) { v = (v << 8) | u8(b, i + k); k += 1 }
      val allOnes = ((1L << (7 * len)) - 1)
      Some((if (v == allOnes) -1L else v, len))
    }

    /** Children of the master element spanning [from, to): (id,
      * payloadStart, payloadEnd). Stops at the first malformed or
      * truncated element. */
    private def children(b: Array[Byte], from: Int, to: Int): Seq[(Long, Int, Int)] = {
      val out = Seq.newBuilder[(Long, Int, Int)]
      var i = from
      var ok = true
      while (ok && i < to) {
        (for {
          (id, il) <- readId(b, i)
          (sz, sl) <- readSize(b, i + il)
        } yield {
          val ps = i + il + sl
          val pe = if (sz < 0) to else ps + sz
          if (pe > to || pe < ps) ok = false
          else { out += ((id, ps, pe.toInt)); i = pe.toInt }
        }).getOrElse { ok = false }
      }
      out.result()
    }

    private def uintAt(b: Array[Byte], s: Int, e: Int): Long = {
      var v = 0L
      var i = s
      while (i < e && i - s < 8) { v = (v << 8) | u8(b, i); i += 1 }
      v
    }

    private def floatAt(b: Array[Byte], s: Int, e: Int): Option[Double] = (e - s) match {
      case 4 => Some(java.lang.Float.intBitsToFloat(be32(b, s).toInt).toDouble)
      case 8 => Some(java.lang.Double.longBitsToDouble(be64(b, s)))
      case _ => None
    }

    /** (format, width, height, nFrames, durationMs), or None. */
    def parse(b: Array[Byte]): Option[(String, Int, Int, Int, Long)] = {
      // EBML header 0x1A45DFA3, then the Segment 0x18538067
      val (hId, hs, he) = children(b, 0, b.length).headOption.getOrElse(return None)
      if (hId != 0x1A45DFA3L) return None
      val fmt = children(b, hs, he).collectFirst {
        case (0x4282L, ds, de) => new String(b, ds, de - ds, "ISO-8859-1")
      } match {
        case Some("webm") => "webm"
        case _            => "mkv"
      }
      val (ss, se) = children(b, he, b.length).collectFirst {
        case (0x18538067L, s, e) => (s, e)
      }.getOrElse(return None)
      val seg = children(b, ss, se)
      var scale = 1000000L // ns per timestamp unit, spec default
      var durUnits = 0.0
      seg.collectFirst { case (0x1549A966L, is, ie) => (is, ie) }.foreach { case (is, ie) =>
        children(b, is, ie).foreach {
          case (0x2AD7B1L, s, e) => scale = uintAt(b, s, e)
          case (0x4489L, s, e)   => floatAt(b, s, e).foreach(durUnits = _)
          case _                 =>
        }
      }
      // first TrackEntry whose TrackType is video (1): dims + number
      var vw = 0
      var vh = 0
      var vTrack = -1L
      seg.collectFirst { case (0x1654AE6BL, ts, te) => (ts, te) }.foreach { case (ts, te) =>
        children(b, ts, te).foreach {
          case (0xAEL, es, ee) if vTrack < 0 =>
            var tpe = -1L
            var num = -1L
            var w = 0
            var h = 0
            children(b, es, ee).foreach {
              case (0x83L, s, e) => tpe = uintAt(b, s, e)
              case (0xD7L, s, e) => num = uintAt(b, s, e)
              case (0xE0L, vs, ve) =>
                children(b, vs, ve).foreach {
                  case (0xB0L, s, e) => w = uintAt(b, s, e).toInt
                  case (0xBAL, s, e) => h = uintAt(b, s, e).toInt
                  case _             =>
                }
              case _ =>
            }
            if (tpe == 1L && w > 0 && h > 0) { vw = w; vh = h; vTrack = num }
          case _ =>
        }
      }
      if (vTrack < 0) return None
      // SimpleBlocks addressed to the video track, across all Clusters
      var frames = 0
      seg.foreach {
        case (0x1F43B675L, cs, ce) =>
          children(b, cs, ce).foreach {
            case (0xA3L, bs, be) =>
              readSize(b, bs).foreach { case (tn, _) => if (tn == vTrack) frames += 1 }
            case _ =>
          }
        case _ =>
      }
      val durMs =
        if (durUnits > 0 && scale > 0) math.floor(durUnits * scale / 1000000.0).toLong else 0L
      Some((fmt, vw, vh, math.max(frames, 1), durMs))
    }
  }

  /** STUB decoder: deterministic fake metadata from raw bytes, the
    * fallback for payloads [[ImageHeader]] doesn't recognize (a real
    * deployment swaps this body for its audio/video codec call; the
    * signature — bytes in, typed struct out — is the stable contract). */
  object FakeDecoder {
    def decode(id: Long, bytes: Array[Byte]): Row = {
      val n = bytes.length.toLong
      val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
      val width = (64 + (n % 1856)).toInt
      val height = (64 + ((n * 7) % 1016)).toInt
      val frames = (1 + (n % 30)).toInt
      Row(id, n, fmt, width, height, frames, n * 40 % 600000)
    }
  }

  /** Production decode: real image/audio/video headers first,
    * deterministic fallback otherwise. PNG/JPEG are stills (n_frames
    * 1); GIF / animated-WebP frame counts come from their block/chunk
    * walks; WAV rows carry null width/height and exact sample-frame
    * count + duration; MP4 rows carry the video track's dimensions,
    * the movie-header duration and the `stts` frame count. */
  def decodeOne(id: Long, bytes: Array[Byte]): Row =
    ImageHeader.parse(bytes) match {
      case Some((fmt, w, h)) =>
        val frames = fmt match {
          case "gif"  => ImageHeader.gifFrameCount(bytes).getOrElse(1)
          case "webp" => ImageHeader.webpFrameCount(bytes).getOrElse(1)
          case _      => 1
        }
        Row(id, bytes.length.toLong, fmt, w, h, frames, 0L)
      case None =>
        WavHeader.parse(bytes).map { case (frames, durMs) =>
          Row(id, bytes.length.toLong, "wav", null, null,
            math.min(frames, Int.MaxValue.toLong).toInt, durMs)
        }.orElse {
          Mp3Header.parse(bytes).map { case (frames, durMs) =>
            Row(id, bytes.length.toLong, "mp3", null, null, frames, durMs)
          }
        }.orElse {
          FlacHeader.parse(bytes).map { case (frames, durMs) =>
            Row(id, bytes.length.toLong, "flac", null, null,
              math.min(frames, Int.MaxValue.toLong).toInt, durMs)
          }
        }.orElse {
          OggHeader.parse(bytes).map { case (codec, frames, durMs) =>
            Row(id, bytes.length.toLong, codec, null, null,
              math.min(frames, Int.MaxValue.toLong).toInt, durMs)
          }
        }.orElse {
          Mp4Header.parse(bytes).map { case (w, h, durMs, frames) =>
            Row(id, bytes.length.toLong, "mp4", w, h, frames, durMs)
          }
        }.orElse {
          MkvHeader.parse(bytes).map { case (fmt, w, h, frames, durMs) =>
            Row(id, bytes.length.toLong, fmt, w, h, frames, durMs)
          }
        }.getOrElse(FakeDecoder.decode(id, bytes))
    }

  /** Real binary ingest: read a directory of media files as
    * (media_id, payload) via Spark's binaryFile source — the production
    * entry point for image/audio/video blobs ([[asMediaTable]] is the
    * fixture twin over text payloads). The id is a 60-bit hash of the
    * file path: deterministic, join-stable, no driver-side numbering. */
  def readBinaryDir(spark: org.apache.spark.sql.SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        graft.functions.Hashing.md5Long(col("path"), 13).as("media_id"),
        col("path"),
        col("length").as("byte_len_raw"),
        col("content").as("payload")
      )

  /** Wrap a text table as a binary media table (payload = utf-8 bytes),
    * standing in for real image/audio blobs. */
  def asMediaTable(docs: DataFrame, idCol: String, payloadFrom: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(payloadFrom), "UTF-8").as("payload")
    )

  /** Decode / feature-extract over partition-local batches. The
    * iterator-in/iterator-out shape is the `mapInPandas` analog: rows
    * stream through in batches of `batchSize`, nothing accumulates. */
  def decodeMetadata(media: DataFrame, batchSize: Int = 256): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(mediaMetaSchema)
    val ds: Dataset[Row] = media.select("media_id", "payload").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
    }
    ds.toDF()
  }

  /** Deterministic frame sampling: every k-th frame index up to
    * n_frames — the shape of a video frame-extraction pass. */
  def sampleFrames(meta: DataFrame, everyK: Int): DataFrame =
    meta.select(
      col("media_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx")
    )

  /** Resize planning: target dimensions that fit each image into a
    * `target`×`target` box preserving aspect ratio. Integer floor
    * division end-to-end — exact, no float boundary, identical in the
    * oracle. (The actual pixel resample would live in the decoder
    * stage; this computes the per-row plan a batch resize consumes.) */
  def resizePlan(meta: DataFrame, target: Int): DataFrame =
    meta.select(
      col("media_id"),
      col("width"),
      col("height"),
      expr(s"CAST(width AS BIGINT) * $target DIV greatest(width, height)").as("resize_w"),
      expr(s"CAST(height AS BIGINT) * $target DIV greatest(width, height)").as("resize_h")
    )
}
