package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines (north-star
  * surface): image/audio/video travel as opaque `binary` columns with typed
  * metadata, and decode / feature-extract / resize / frame-sample run as
  * per-partition batch transforms.
  *
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * environment): `StubCodec` derives deterministic fake dimensions/features
  * from the bytes. Everything Spark-side is real and tested — schema, binary
  * encoding, partition-batched execution via `mapPartitions` (the Scala
  * analog of `mapInPandas`: one iterator per partition, so a real decoder
  * would amortize model/codec init across the batch exactly like a Pandas
  * UDF), and the fixed-width feature output shape.
  *
  * At 100 TB: binary payloads dominate row size — repartition by a size-
  * aware key before decode so partitions stay under executor memory, keep
  * metadata in separate narrow columns so pure-metadata queries never read
  * the blob (parquet column pruning), and store frames/features as separate
  * tables keyed by (media_id, frame_no).
  */
object Multimodal {

  case class MediaMeta(mediaType: String, nBytes: Long, width: Int,
                       height: Int, durationMs: Long)
  case class MediaRow(doc_id: Long, content: Array[Byte], mediaType: String)
  case class DecodedRow(doc_id: Long, mediaType: String, nBytes: Long,
                        width: Int, height: Int, durationMs: Long)
  case class FeatureRow(doc_id: Long, features: Array[Float])
  case class FrameRow(doc_id: Long, frameNo: Int, frameBytes: Array[Byte])

  /** STUB decoder: deterministic fake dimensions from the payload size.
    * Replace with a real codec (???) when the imaging libs exist; signature
    * and batch shape are the real contract.
    */
  object StubCodec {
    def probe(bytes: Array[Byte], mediaType: String): MediaMeta = {
      val n = bytes.length.toLong
      MediaMeta(mediaType, n, (n % 640).toInt, (n * 7 % 480).toInt, n * 3 % 10000)
    }
    /** Fake fixed-width feature vector (a real impl would run a vision/audio
      * encoder over the decoded frames). */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var acc = 0L
      var i = 0
      while (i < bytes.length) {
        acc = (acc * 31 + (bytes(i) & 0xff)) % (1L << 57)
        out(i % dim) = ((acc % 1000) / 1000.0f)
        i += 1
      }
      out
    }
    /** Fake frame sampler: every `stride`-th 1KiB slice stands in for a
      * decoded video frame. */
    def sampleFrames(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
      bytes.grouped(1024).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => chunk }.toSeq
  }

  /** Attach a binary payload column (here: utf-8 of `text`, standing in for
    * real image/audio bytes) + media type. */
  def asMedia(docs: DataFrame, mediaType: String = "image/png"): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").cast("binary").as("content"),
      lit(mediaType).as("media_type"))

  /** Decode pass: per-partition batched probe of each payload — metadata
    * out, blob dropped (narrow output). */
  def decodeMeta(media: DataFrame)(implicit s: SparkSession): Dataset[DecodedRow] = {
    import s.implicits._
    media.select(col("doc_id"), col("content"), col("media_type").as("mediaType"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // batch boundary: real codecs init once here, then stream the batch
        rows.map { r =>
          val m = StubCodec.probe(r.content, r.mediaType)
          DecodedRow(r.doc_id, m.mediaType, m.nBytes, m.width, m.height,
            m.durationMs)
        }
      }
  }

  /** Feature-extraction pass: fixed-width float vector per payload. */
  def extractFeatures(media: DataFrame, dim: Int = 16)
                     (implicit s: SparkSession): Dataset[FeatureRow] = {
    import s.implicits._
    media.select(col("doc_id"), col("content"), col("media_type").as("mediaType"))
      .as[MediaRow]
      .mapPartitions(_.map(r => FeatureRow(r.doc_id,
        StubCodec.features(r.content, dim))))
  }

  /** Resize pass: re-encode each payload to target dimensions. The codec
    * call is the stub (a real impl decodes, scales, re-encodes); the
    * contract — binary in, binary out, metadata updated, batched per
    * partition — is real. The stub deterministically truncates/pads the
    * payload to `targetW*targetH/16` bytes so output size tracks the
    * requested dimensions. */
  def resize(media: DataFrame, targetW: Int, targetH: Int)
            (implicit s: SparkSession): Dataset[MediaRow] = {
    import s.implicits._
    val outLen = math.max(1, targetW * targetH / 16)
    media.select(col("doc_id"), col("content"), col("media_type").as("mediaType"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val out = java.util.Arrays.copyOf(r.content, outLen)
        MediaRow(r.doc_id, out, r.mediaType)
      })
  }

  case class HashRow(doc_id: Long, phash: Long)

  /** aHash-style 64-bit perceptual hash per payload: downsample the decoded
    * grayscale to an 8×8 grid, bit i = cell i brighter than the mean — tiny
    * payload edits flip few cells, so near-identical media land within a
    * small Hamming radius. The decode is the stub (cells here average raw
    * payload byte chunks); the hash construction, batching, and the
    * banded pair search ([[perceptualDupPairs]]) are the real contract.
    */
  def perceptualHash(media: DataFrame)
                    (implicit s: SparkSession): Dataset[HashRow] = {
    import s.implicits._
    media.select(col("doc_id"), col("content"), col("media_type").as("mediaType"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val cells = new Array[Long](64)
        val counts = new Array[Int](64)
        val n = r.content.length
        var i = 0
        while (i < n) {
          // fixed 64-way split of the payload = the stub "8x8 downsample"
          val c = (i.toLong * 64 / math.max(n, 1)).toInt
          cells(c) += (r.content(i) & 0xffL)
          counts(c) += 1
          i += 1
        }
        var total = 0L
        var c = 0
        while (c < 64) {
          if (counts(c) > 0) cells(c) = cells(c) / counts(c)
          total += cells(c)
          c += 1
        }
        // bit = cell brighter than the mean, as the integer comparison
        // cell*64 > Σcells — exact, portable arithmetic (no float mean),
        // so the hash is reproducible by any engine including the oracle
        var h = 0L
        c = 0
        while (c < 64) {
          if (cells(c) * 64 > total) h |= 1L << c
          c += 1
        }
        HashRow(r.doc_id, h)
      })
  }

  /** Perceptual near-duplicate pairs: media whose aHash signatures are
    * within Hamming `maxDist`, found with the same pigeonhole banding as
    * text SimHash ([[graft.llm.Dedup.hammingPairs]]) — one bucket join,
    * never all-pairs. */
  def perceptualDupPairs(media: DataFrame, maxDist: Int = 3)
                        (implicit s: SparkSession): DataFrame =
    Dedup.hammingPairs(perceptualHash(media).toDF(), maxDist,
      "doc_id", "phash")

  /** Frame-sampling pass: one output row per sampled frame (N→M). */
  def sampleFrames(media: DataFrame, stride: Int = 2)
                  (implicit s: SparkSession): Dataset[FrameRow] = {
    import s.implicits._
    media.select(col("doc_id"), col("content"), col("media_type").as("mediaType"))
      .as[MediaRow]
      .mapPartitions(_.flatMap(r =>
        StubCodec.sampleFrames(r.content, stride).zipWithIndex.map {
          case (f, i) => FrameRow(r.doc_id, i, f)
        }))
  }
}
