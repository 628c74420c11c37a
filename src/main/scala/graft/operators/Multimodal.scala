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
}
