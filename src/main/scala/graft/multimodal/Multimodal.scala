package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The decode step is a clearly-marked STUB (the container has no
  * image/audio codecs): [[FakeDecoder]] derives deterministic
  * pseudo-metadata from the bytes. Everything around it — the binary
  * column schema, the batched `mapPartitions` shape (the Scala
  * equivalent of `mapInPandas`: an iterator-of-batches UDF that never
  * materializes a partition), the typed output struct, and partition
  * sizing — is real and tested, so swapping in a real codec is a
  * one-function change.
  *
  * Scale notes: binary payloads dominate row width, so the operator (a)
  * keeps the decode in a narrow `mapPartitions` (no shuffle), (b)
  * projects metadata out BEFORE any wide operation, and (c) repartitions
  * by byte budget, not row count, when payloads are skewed.
  */
object Multimodal {

  /** Typed metadata produced by the (stubbed) decoder. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType)
  ))

  /** STUB decoder: deterministic fake metadata from raw bytes. A real
    * deployment replaces this body with an actual codec call; the
    * signature (bytes in, typed struct out) is the stable contract. */
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
        batch.map(r => FakeDecoder.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
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
