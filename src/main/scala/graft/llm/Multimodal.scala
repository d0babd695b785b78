package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines (north-star
  * surface): image/audio/video travel as opaque `binary` columns with typed
  * metadata, and decode / feature-extract / resize / frame-sample run as
  * per-partition batch transforms.
  *
  * Metadata decode is REAL for the header-decodable formats ([[HeaderCodec]]
  * — PNG / GIF / BMP / JPEG dimensions and WAV duration are fixed-offset
  * integer reads straight off the public file-format specs, no imaging
  * library involved; r16/r17 VERDICT items). Payload-content work that
  * genuinely needs a pixel/sample decoder (video frames, feature
  * encoders) stays STUBBED: `StubCodec` derives deterministic fake values
  * from the bytes, and rows it handled are flagged loudly (`codec='stub'`).
  * Everything Spark-side is real and tested — schema, binary encoding,
  * partition-batched execution via `mapPartitions` (the Scala analog of
  * `mapInPandas`: one iterator per partition, so a real decoder would
  * amortize model/codec init across the batch exactly like a Pandas UDF),
  * and the fixed-width feature output shape.
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
  case class DecodedRow(doc_id: Long, codec: String, nBytes: Long,
                        width: Int, height: Int, durationMs: Long)
  case class FeatureRow(doc_id: Long, features: Array[Float])
  case class FrameRow(doc_id: Long, frameNo: Int, frameBytes: Array[Byte])

  /** REAL metadata decode for the formats whose dimensions/duration are
    * fixed-offset integer reads in the public file-format headers — no
    * imaging library needed (r16 VERDICT item #3):
    *
    *  - PNG: 8-byte signature, then the IHDR chunk; width/height are
    *    big-endian u32 at byte offsets 16/20 (PNG spec §11.2.2).
    *  - GIF: "GIF87a"/"GIF89a", then the Logical Screen Descriptor;
    *    width/height are little-endian u16 at offsets 6/8.
    *  - BMP: "BM" file header (14 bytes), then BITMAPINFOHEADER;
    *    width/height are little-endian i32 at offsets 18/22 (height may
    *    be negative for top-down DIBs — magnitude is the dimension).
    *  - WAV: RIFF/WAVE container; the `fmt ` chunk's byte-rate field
    *    (little-endian u32 at fmt-data offset 8) and the `data` chunk's
    *    size give duration_ms = data_size * 1000 / byte_rate.
    *  - JPEG: SOI (0xFFD8), then a chain of length-prefixed marker
    *    segments; height/width are big-endian u16 at offsets 3/5 of the
    *    first SOFn segment (0xFFC0–0xFFCF minus DHT 0xC4 / JPG 0xC8 /
    *    DAC 0xCC — JPEG spec B.2.2). The r17 VERDICT corrected the old
    *    doc claim here: dimensions sit in the SOFn MARKER HEADER, before
    *    any entropy-coded data, so a marker-chain walk suffices — no
    *    entropy decoder needed.
    *
    * `sniff` keys on the MAGIC BYTES, never the declared media type — a
    * mislabeled payload decodes as what it is. Formats that need a real
    * pixel decoder (video needs a demuxer) return None and fall to
    * [[StubCodec]], flagged `codec = "stub"`. All reads are
    * bounds-checked and marker walks run in Long arithmetic: a truncated
    * or hostile header returns None rather than throwing or wrapping an
    * offset back into the buffer. */
  object HeaderCodec {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
        (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def le16(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
        (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
    private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
      i + s.length <= b.length &&
        s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** (codec, width, height, duration_ms) from the magic bytes, or None
      * when the format is not header-decodable. */
    def sniff(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
      if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
        ascii(b, 12, "IHDR")) {
        // PNG dims are 31-bit positive per spec — a field >= 2^31 would
        // wrap .toInt negative; hostile/corrupt headers fall to the stub
        val (w, h) = (be32(b, 16), be32(b, 20))
        if (w >= 1L && w <= Int.MaxValue && h >= 1L && h <= Int.MaxValue)
          Some(("png", w.toInt, h.toInt, 0L))
        else None
      } else if (b.length >= 13 &&
        (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a"))) {
        // u16 dims cannot be negative, but zero is still a hostile
        // header, not a decodable image (same policy as PNG/BMP)
        val (w, h) = (le16(b, 6), le16(b, 8))
        if (w > 0 && h > 0) Some(("gif", w, h, 0L)) else None
      }
      else if (b.length >= 54 && ascii(b, 0, "BM") && le32(b, 14) == 40L) {
        // BMP width must be positive; height may be negative (top-down
        // DIB) and its magnitude is the dimension — anything else is a
        // hostile header, not a decodable image
        val w = le32(b, 18).toInt
        val h = le32(b, 22).toInt
        if (w > 0 && h != 0 && h != Int.MinValue)
          Some(("bmp", w, math.abs(h), 0L))
        else None
      } else if (b.length >= 12 && ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE"))
        sniffWav(b)
      else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8)
        sniffJpeg(b)
      else None
    }

    /** Walk the JPEG marker chain from SOI to the first SOFn frame
      * header (spec B.2.2): markers are 0xFF + code (0xFF fill bytes
      * skipped), and every non-standalone segment carries a big-endian
      * u16 length that INCLUDES the two length bytes. Height/width are
      * u16 at SOFn-data offsets 1/3 (after the precision byte). The
      * cursor walks in LONG arithmetic like [[sniffWav]]: a hostile
      * segment length must run off the end of the buffer (None), never
      * wrap back into it. Stops at SOS/EOI — past SOS lies the
      * entropy-coded scan, and a frame header cannot legally follow. */
    private def sniffJpeg(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
      var off = 2L
      while (off + 4 <= b.length) {
        val o = off.toInt // safe: off + 4 <= b.length <= Int.MaxValue
        if (u8(b, o) != 0xff) return None // desynced marker chain
        var mo = o
        while (mo + 1 < b.length && u8(b, mo + 1) == 0xff) mo += 1 // fill
        if (mo + 3 >= b.length) return None
        val marker = u8(b, mo + 1)
        marker match {
          case 0xd8 | 0x01 => off = mo + 2L // standalone: SOI dup, TEM
          case m if m >= 0xd0 && m <= 0xd7 => off = mo + 2L // RSTn
          case 0xd9 | 0xda => return None // EOI / SOS before any SOFn
          case m =>
            val len = (u8(b, mo + 2) << 8) | u8(b, mo + 3) // incl. itself
            if (len < 2) return None
            val isSof = m >= 0xc0 && m <= 0xcf &&
              m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof) {
              // segment data: precision u8, height u16, width u16
              if (len < 7 || mo + 2L + 7 > b.length) return None
              val h = (u8(b, mo + 5) << 8) | u8(b, mo + 6)
              val w = (u8(b, mo + 7) << 8) | u8(b, mo + 8)
              return if (w > 0 && h > 0) Some(("jpeg", w, h, 0L)) else None
            }
            off = mo + 2L + len
        }
      }
      None
    }

    /** Walk the RIFF chunk list for `fmt ` (byte rate) and `data`
      * (payload size); duration needs both. Chunks are 8-byte headers
      * (id + little-endian size) with word-aligned bodies. The offset
      * walks in LONG arithmetic: a declared chunk size near 2^31 must
      * run the cursor off the end of the buffer (loop exit), never wrap
      * an Int negative back INTO it (the review-caught
      * ArrayIndexOutOfBounds on a hostile size that passed an Int-side
      * guard). */
    private def sniffWav(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
      var off = 12L
      var byteRate = 0L
      var dataSize = -1L
      while (off + 8 <= b.length && (byteRate == 0L || dataSize < 0L)) {
        val o = off.toInt // safe: off + 8 <= b.length <= Int.MaxValue
        val size = le32(b, o + 4) // u32 as Long, never negative
        if (ascii(b, o, "fmt ") && off + 8 + 12 <= b.length)
          byteRate = le32(b, o + 16) // fmt data offset 8 = byte rate
        else if (ascii(b, o, "data")) dataSize = size
        off += 8L + size + (size & 1L) // word-aligned; Long, no wrap
      }
      if (byteRate > 0L && dataSize >= 0L)
        Some(("wav", 0, 0, dataSize * 1000L / byteRate))
      else None
    }
  }

  /** STUB decoder — since r18 only for formats that genuinely need a
    * demuxer/sample decoder (video, compressed audio) or foreign bytes:
    * deterministic fake dimensions from the payload size. Replace with a
    * real codec (???) when the media libs exist; signature and batch
    * shape are the real contract.
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

  /** Synthesize VALID media payloads from the documents table — one file
    * per doc with a real spec-conformant header (PNG CRC included) and the
    * doc's utf-8 text as the body, format and dimensions drawn
    * deterministically from doc_id:
    *
    *   format = doc_id % 5 → png / gif / bmp / wav / jpeg
    *   width  = doc_id % 640 + 1, height = doc_id·7 % 480 + 1 (images)
    *   wav    = mono 16-bit @ 8 kHz (byte rate 16000), data = the text
    *   jpeg   = SOI + APP0 (JFIF 1.1) + single-component SOF0 (r17
    *            VERDICT #2 — 33 header bytes, like the PNG)
    *
    * This is q38's fixture generator: [[decodeMeta]] recovers the
    * dimensions by PARSING THE BYTES while the DuckDB oracle recomputes
    * them from the doc_id formulas — equality proves the header decode
    * inverts the synthesis, which is exactly the real-decode guarantee a
    * no-imaging-libs sandbox can check. */
  def synthesizeMedia(docs: DataFrame)
                     (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").cast("binary")
        .as("content"), lit("synth").as("mediaType"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val w = (r.doc_id % 640 + 1).toInt
        val h = (r.doc_id * 7 % 480 + 1).toInt
        val bytes = (r.doc_id % 5) match {
          case 0 => synthPng(w, h, r.content)
          case 1 => synthGif(w, h, r.content)
          case 2 => synthBmp(w, h, r.content)
          case 3 => synthWav(r.content)
          case _ => synthJpeg(w, h, r.content)
        }
        val mt = (r.doc_id % 5) match {
          case 0 => "image/png"
          case 1 => "image/gif"
          case 2 => "image/bmp"
          case 3 => "audio/wav"
          case _ => "image/jpeg"
        }
        MediaRow(r.doc_id, bytes, mt)
      })
      .toDF("doc_id", "content", "media_type")
  }

  private def synthPng(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(17) // type + 13 data bytes
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte).put(0.toByte) // bit depth 8, grayscale
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
    val chunk = ihdr.array()
    val len = java.nio.ByteBuffer.allocate(4).putInt(13).array()
    val crc = new java.util.zip.CRC32(); crc.update(chunk)
    val crcB = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt)
      .array()
    out.write(len); out.write(chunk); out.write(crcB); out.write(body)
    out.toByteArray
  }

  private def synthGif(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte]((w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
      0.toByte, 0.toByte, 0.toByte)) // flags, bg index, aspect
    out.write(body)
    out.toByteArray
  }

  private def synthBmp(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + body.length) // file size
    buf.putInt(0).putInt(54) // reserved, pixel-data offset
    buf.putInt(40) // BITMAPINFOHEADER size
    buf.putInt(w).putInt(h)
    buf.putShort(1.toShort).putShort(8.toShort) // planes, bpp
    buf.putInt(0).putInt(body.length) // compression BI_RGB, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // ppm, palette
    val out = new java.io.ByteArrayOutputStream()
    out.write(buf.array()); out.write(body)
    out.toByteArray
  }

  /** Minimal valid JFIF: SOI, APP0 (JFIF 1.1, unit-less 1:1 density, no
    * thumbnail), single-component grayscale SOF0 carrying the
    * dimensions, then the body. 2 + 18 + 13 = 33 header bytes. */
  private def synthJpeg(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(33) // big-endian by default
    buf.put(0xff.toByte).put(0xd8.toByte) // SOI
    buf.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort) // APP0
    buf.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    buf.put(1.toByte).put(1.toByte) // version 1.1
    buf.put(0.toByte) // density units: none
    buf.putShort(1.toShort).putShort(1.toShort) // 1:1 aspect
    buf.put(0.toByte).put(0.toByte) // no thumbnail
    buf.put(0xff.toByte).put(0xc0.toByte).putShort(11.toShort) // SOF0
    buf.put(8.toByte) // precision
    buf.putShort((h & 0xffff).toShort).putShort((w & 0xffff).toShort)
    buf.put(1.toByte) // one component
    buf.put(1.toByte).put(0x11.toByte).put(0.toByte) // id, 1x1, quant 0
    val out = new java.io.ByteArrayOutputStream()
    out.write(buf.array()); out.write(body)
    out.toByteArray
  }

  /** Mono 16-bit 8 kHz — byte rate 16000, so duration_ms = len/16. */
  private def synthWav(body: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + body.length)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort).putShort(1.toShort) // PCM, mono
    buf.putInt(8000).putInt(16000) // sample rate, byte rate
    buf.putShort(2.toShort).putShort(16.toShort) // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(body.length)
    val out = new java.io.ByteArrayOutputStream()
    out.write(buf.array()); out.write(body)
    out.toByteArray
  }

  /** Decode pass: per-partition batched probe of each payload — metadata
    * out, blob dropped (narrow output). Header-decodable formats
    * ([[HeaderCodec]]: PNG/GIF/BMP/WAV/JPEG) report their REAL parsed
    * dimensions/duration with `codec` naming the format; anything else
    * falls to the deterministic [[StubCodec]] and is flagged loudly with
    * `codec = "stub"`. */
  def decodeMeta(media: DataFrame)(implicit s: SparkSession): Dataset[DecodedRow] = {
    import s.implicits._
    media.select(col("doc_id"), col("content"), col("media_type").as("mediaType"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // batch boundary: real codecs init once here, then stream the batch
        rows.map { r =>
          HeaderCodec.sniff(r.content) match {
            case Some((codec, w, h, durMs)) =>
              DecodedRow(r.doc_id, codec, r.content.length.toLong, w, h,
                durMs)
            case None =>
              val m = StubCodec.probe(r.content, r.mediaType)
              DecodedRow(r.doc_id, "stub", m.nBytes, m.width, m.height,
                m.durationMs)
          }
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
