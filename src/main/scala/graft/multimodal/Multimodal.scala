package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY.md §2.3 #46): media as opaque
  * `binary` columns plus typed metadata.
  *
  * The Spark-side plumbing — schema, batched per-partition decode,
  * metadata extraction as plan expressions — is real; the actual
  * image/audio decode is STUBBED with a deterministic fake (this
  * container has no media libraries). Swap [[fakeDecode]] for a real
  * decoder (e.g. TwelveMonkeys/JavaCV) without touching the plumbing.
  */
object Multimodal {

  /** A media row: opaque payload + its id. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed decode output (what a real image decode would yield). */
  final case class DecodedMedia(doc_id: Long, byte_len: Long, sha: String,
                                width: Long, height: Long)

  /** Attach a binary payload column (here: the UTF-8 text bytes stand in
    * for image bytes) with expression-level metadata — byte length,
    * sha-256, and the stubbed decode's dimensions. Everything is a
    * codegen'd column expression; nothing leaves the scan stage. */
  def withMetadata(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      octet_length(col(textCol).cast(BinaryType)).cast(LongType).as("byte_len"),
      sha2(col(textCol).cast(BinaryType), 256).as("sha"),
      (octet_length(col(textCol).cast(BinaryType)).cast(LongType) % 640).as("width"),
      (octet_length(col(textCol).cast(BinaryType)).cast(LongType) * 7 % 480).as("height"))

  /** STUB — deterministic fake decode. A real implementation would parse
    * the image header / decode frames here. Kept bit-identical to the
    * expression path in [[withMetadata]] so both are interchangeable. */
  def fakeDecode(m: MediaRow): DecodedMedia = {
    val len = m.payload.length.toLong
    val md = MessageDigest.getInstance("SHA-256")
    val sha = md.digest(m.payload).map("%02x".format(_)).mkString
    DecodedMedia(m.doc_id, len, sha, len % 640, len * 7 % 480)
  }

  /** Batched per-partition decode path: the shape a real decoder needs —
    * amortized per-batch setup (decoder init), bounded batch memory.
    * `mapPartitions` is the deliberate last-resort tool here
    * (imperative per-row work that Catalyst can't express). */
  def decode(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Per-partition decoder setup would go here (once, not per row).
      it.grouped(batchSize).flatMap { batch => batch.map(fakeDecode) }
    }
  }

  /** documents → MediaRow dataset (text bytes stand in for media). */
  def asMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType).as("doc_id"),
      col(textCol).cast(BinaryType).as("payload")).as[MediaRow]
  }

  /** A sampled video frame (stub: content hash stands in for pixels). */
  final case class FrameRow(doc_id: Long, frame_idx: Long, frame_hash: Long)

  /** STUB frame extraction: a real decoder would seek+decode; the fake
    * derives a deterministic per-frame hash. One "frame" per KB of
    * payload; emit every `stride`-th. The plumbing — per-partition
    * batched iteration, bounded output explode — is the real shape. */
  def frameSample(media: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val nFrames = math.max(m.payload.length / 1024, 1)
        (0 until nFrames by stride).iterator.map { i =>
          // splitmix-style deterministic fake "frame content"
          var z = m.doc_id * 0x9e3779b97f4a7c15L + i
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          FrameRow(m.doc_id, i.toLong, z ^ (z >>> 31))
        }
      }
    }
  }

  /** Resize metadata: fit the (stubbed) decoded dims into a square box,
    * aspect preserved — pure double arithmetic, identical across
    * engines (oracle-checked). */
  def withResize(df: DataFrame, box: Int): DataFrame = {
    val w0 = greatest(col("width"), lit(1L))
    val h0 = greatest(col("height"), lit(1L))
    val scale = least(lit(box.toDouble) / w0, lit(box.toDouble) / h0)
    df.withColumn("out_w", floor(w0 * scale).cast(LongType))
      .withColumn("out_h", floor(h0 * scale).cast(LongType))
  }
}
