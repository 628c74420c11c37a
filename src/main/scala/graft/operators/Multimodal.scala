package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque binary
  * columns with typed metadata alongside. The decode step is a STUB (no
  * image/audio codecs in this environment) — `fakeDecode` derives
  * deterministic pseudo-metadata from the bytes — but the Spark-side
  * plumbing is real: binary column in, per-partition batched iteration,
  * typed Dataset out. Swap `fakeDecode` for a real codec (JNI / Pandas UDF)
  * without touching the surrounding plan.
  */
object Multimodal {

  /** Typed metadata produced by the (stubbed) decoder. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Long, height: Long,
      n_frames: Long, fp: String)

  /** STUB decoder: deterministic fake metadata derived from payload bytes.
    * A real implementation would parse the container header here.
    */
  def fakeDecode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length.toLong
    val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val fp = digest.map("%02x".format(_)).mkString
    MediaFeatures(docId, n, n % 640, (n * 7) % 480, n % 30 + 1, fp)
  }

  /** Decode features from a (doc_id, blob binary) frame via per-partition
    * iteration — the pattern for batching expensive decoders (one codec
    * init per partition, streaming rows through it).
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // codec initialization would happen once per partition here
        rows.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** Documents-as-media: treat the UTF-8 text payload as the binary blob
    * (the testdata ships no real media; the column shape is what matters).
    */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))

  /** Frame sampling: one row per sampled frame index (every stride-th frame
    * of n_frames) — the explode-shaped plumbing of a video pipeline. Scales
    * as a narrow generate: no shuffle, output rows ~ frames/stride.
    */
  def frameSample(features: DataFrame, stride: Int = 5): DataFrame =
    features.select(col("doc_id"), col("n_frames"),
      explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
        .as("frame_idx"))

  // -------------------------------------------------------------------
  // REAL container-header parsing (not stubbed): dimensions/sample-rate
  // live in the first bytes of the container, so a media catalog pass
  // (the "what is in this 100 TB of blobs" scan) needs byte parsing
  // only, no codec. Pixel/audio DECODE remains the documented stub
  // above; header metadata extraction is genuine.

  /** Parsed container metadata; format "unknown" when no signature
    * matches (fields 0).
    */
  final case class MediaHeader(doc_id: Long, format: String, width: Long,
      height: Long, sample_rate: Long, channels: Long)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Parse a PNG (IHDR), JPEG (SOF0/SOF2 walk), or WAV (RIFF fmt chunk)
    * header. Pure byte inspection of the leading container structure —
    * the real thing, independent of how the bytes were produced.
    */
  def parseHeader(docId: Long, b: Array[Byte]): MediaHeader = {
    def unknown = MediaHeader(docId, "unknown", 0L, 0L, 0L, 0L)
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      MediaHeader(docId, "png", be32(b, 16), be32(b, 20), 0L, 0L)
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // walk FF-marker segments to the first SOF (C0..C3, C5..C7, C9..CB)
      var i = 2
      while (i + 4 <= b.length) {
        if ((b(i) & 0xff) != 0xff) return unknown
        val marker = b(i + 1) & 0xff
        val len = be16(b, i + 2)
        if (marker >= 0xc0 && marker <= 0xcb && marker != 0xc4 && marker != 0xc8) {
          if (i + 9 > b.length) return unknown
          return MediaHeader(docId, "jpeg", be16(b, i + 7).toLong,
            be16(b, i + 5).toLong, 0L, 0L)
        }
        i += 2 + len
      }
      unknown
    } else if (b.length >= 36 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
        b(12) == 'f' && b(13) == 'm' && b(14) == 't' && b(15) == ' ')
      MediaHeader(docId, "wav", 0L, 0L, le32(b, 24), le16(b, 22).toLong)
    else unknown
  }

  /** Parse headers for a (doc_id, blob) frame — same per-partition
    * batching shape as [[decodeFeatures]], narrow end to end.
    */
  def headerScan(spark: SparkSession, media: DataFrame): Dataset[MediaHeader] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) =>
        parseHeader(id, bytes) })
  }

  // ---- deterministic container builders (test/fixture side; the parser
  // above never sees these — it reads bytes only) ----------------------

  def makePng(width: Long, height: Long): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13) // IHDR length
    out.put("IHDR".getBytes("US-ASCII"))
    out.putInt(width.toInt).putInt(height.toInt)
    out.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.array()
  }

  def makeJpeg(width: Long, height: Long): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 18 + 13)
    out.put(0xff.toByte).put(0xd8.toByte)
    // APP0/JFIF segment before the SOF, so the parser must really walk
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort)
    out.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    out.put(Array.fill(9)(0.toByte))
    out.put(0xff.toByte).put(0xc0.toByte).putShort(11.toShort)
    out.put(8.toByte)
    out.putShort(height.toShort).putShort(width.toShort)
    out.put(3.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.array()
  }

  def makeWav(sampleRate: Long, channels: Long): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1.toShort).putShort(channels.toShort)
    out.putInt(sampleRate.toInt).putInt((sampleRate * channels * 2).toInt)
    out.putShort((channels * 2).toShort).putShort(16.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(0)
    out.array()
  }
}
