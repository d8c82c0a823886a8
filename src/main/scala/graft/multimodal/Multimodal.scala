package graft.multimodal

import java.io.ByteArrayInputStream
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY.md §2.3 #46): media as opaque
  * `binary` columns plus typed metadata.
  *
  * Two decode paths share one plumbing shape (batched mapPartitions,
  * per-partition setup, bounded batch memory):
  *  - [[fakeDecode]] — deterministic fake over arbitrary bytes, kept
  *    because the sf testdata payloads are text stand-ins and the
  *    oracle replay must be engine-independent;
  *  - [[imageMeta]] / [[imageDecode]] / [[imageResize]] — REAL
  *    JPEG/PNG/GIF/BMP decode on `javax.imageio` (JDK-only, zero new
  *    dependencies). Metadata reads the header ONLY (no pixel decode —
  *    the 100 TB fast path); feature extraction and resize decode
  *    pixels. Video frame seeking stays stubbed ([[frameSample]]) —
  *    the JDK has no video codecs.
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

  /** Real decode output: header metadata plus extracted pixel features
    * (mean channel values ×1000, truncated — integer-exact so the spec
    * can assert them against an independently computed expectation). */
  final case class ImageFeatures(doc_id: Long, format: String,
                                 width: Long, height: Long,
                                 mean_r: Long, mean_g: Long, mean_b: Long)

  /** REAL header-only metadata decode: `ImageIO` reader dimensions
    * without decoding pixels. Returns None for bytes no installed
    * reader recognizes (corrupt / non-image payloads are data, not
    * exceptions, in a 100 TB corpus). */
  def imageMeta(m: MediaRow): Option[DecodedMedia] = {
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(m.payload))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          val md = MessageDigest.getInstance("SHA-256")
          val sha = md.digest(m.payload).map("%02x".format(_)).mkString
          Some(DecodedMedia(m.doc_id, m.payload.length.toLong, sha,
            r.getWidth(0).toLong, r.getHeight(0).toLong))
        } finally r.dispose()
      }
    } catch { case _: Exception => None } finally in.close()
  }

  /** REAL full decode + feature extraction: mean R/G/B over all pixels,
    * reported as floor(mean*1000) so the value is bit-deterministic.
    * This is the expensive path — only run it downstream of filters
    * that [[imageMeta]]'s header fields can answer. */
  def imageDecode(m: MediaRow): Option[ImageFeatures] = {
    try {
      val in = ImageIO.createImageInputStream(new ByteArrayInputStream(m.payload))
      try {
        val readers = ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val fmt = r.getFormatName.toLowerCase
            val img = r.read(0)
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            Some(ImageFeatures(m.doc_id, fmt, w.toLong, h.toLong,
              sr * 1000 / n, sg * 1000 / n, sb * 1000 / n))
          } finally r.dispose()
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Distributed REAL metadata pass — same mapPartitions shape as
    * [[decode]]; `ImageIO.setUseCache(false)` once per partition so
    * executors never spill decode scratch to local disk. */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap(imageMeta)
    }
  }

  /** Distributed REAL decode+features pass. */
  def decodeImageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap(imageDecode)
    }
  }

  /** A resized image: the actually-resampled PNG payload + out dims. */
  final case class ResizedMedia(doc_id: Long, out_w: Long, out_h: Long,
                                png: Array[Byte])

  /** REAL pixel resize: fit into a `box`×`box` square, aspect
    * preserved (same floor arithmetic as [[withResize]]'s metadata
    * form), bilinear resample, re-encode PNG (deterministic codec).
    * Skips payloads no reader recognizes. */
  def imageResize(media: Dataset[MediaRow], box: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap { m =>
        try {
          val img = ImageIO.read(new ByteArrayInputStream(m.payload))
          if (img == null) None
          else {
            val (w0, h0) = (math.max(img.getWidth, 1), math.max(img.getHeight, 1))
            val scale = math.min(box.toDouble / w0, box.toDouble / h0)
            val (w1, h1) = (math.max(math.floor(w0 * scale).toInt, 1),
                            math.max(math.floor(h0 * scale).toInt, 1))
            val out = new java.awt.image.BufferedImage(
              w1, h1, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w1, h1, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            ImageIO.write(out, "png", bos)
            Some(ResizedMedia(m.doc_id, w1.toLong, h1.toLong, bos.toByteArray))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  // ---- REAL audio decode (javax.sound.sampled, JDK-only) -------------------

  /** Audio header metadata — read WITHOUT decoding samples. */
  final case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
                             n_frames: Long, duration_ms: Long)

  /** Extracted signal features over 16-bit PCM frames (channel 0):
    * exact integer peak / zero-crossing count, RMS ×1000 floored —
    * the audio analog of [[ImageFeatures]]. */
  final case class AudioFeatures(doc_id: Long, peak: Long,
                                 zero_crossings: Long, rms_x1000: Long)

  /** REAL header-only audio metadata (WAV/AIFF/AU — the JDK readers).
    * Non-audio payloads are data, not exceptions. */
  def audioMeta(m: MediaRow): Option[AudioMeta] = {
    try {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new ByteArrayInputStream(m.payload))
      val af = fmt.getFormat
      val frames = fmt.getFrameLength.toLong
      Some(AudioMeta(m.doc_id, af.getSampleRate.toLong, af.getChannels.toLong,
        frames, frames * 1000L / math.max(af.getSampleRate.toLong, 1L)))
    } catch { case _: Exception => None }
  }

  /** REAL sample decode + feature extraction over signed 16-bit PCM
    * little-endian (the synthesis/ingest format); other encodings are
    * skipped rather than mis-read. */
  def audioDecode(m: MediaRow): Option[AudioFeatures] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(m.payload))
      try {
        val af = in.getFormat
        if (af.getSampleSizeInBits != 16 || af.isBigEndian ||
            af.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val bytes = in.readAllBytes()
          val step = af.getFrameSize // skip to channel 0 of each frame
          var (i, prev, peak, zc, sumSq, n) = (0, 0, 0L, 0L, 0L, 0L)
          while (i + 1 < bytes.length) {
            val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toInt
            peak = math.max(peak, math.abs(s).toLong)
            if (n > 0 && ((s < 0 && prev >= 0) || (s >= 0 && prev < 0))) zc += 1
            sumSq += s.toLong * s; n += 1; prev = s
            i += step
          }
          if (n == 0) None
          else Some(AudioFeatures(m.doc_id, peak, zc,
            (math.sqrt(sumSq.toDouble / n) * 1000).toLong))
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Distributed audio passes — same batched mapPartitions shape. */
  def decodeAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(audioMeta))
  }

  def decodeAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(audioDecode))
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

  /** Uniform k-frame sampling SCHEDULE (SURVEY.md §2 row 228) — the
    * deterministic plan a video featurizer executes: k frames at
    * maximally even spacing, idx_i = floor(i·(n−1)/(k−1)) for
    * i = 0..k−1 (first and last frames always included — the CLIP-
    * style uniform sampling convention), collapsing to DISTINCT
    * indices when the clip has fewer than k frames (a 3-frame clip
    * yields 3 rows, not k duplicates). The schedule is pure integer
    * arithmetic over the metadata (n_frames — here the stubbed
    * 1-frame-per-KB rule), so unlike the decode it is ORACLE-EXACT:
    * the plan ships to the decode stage ([[frameSample]]'s
    * mapPartitions shape) which seeks exactly these indices. At
    * 100 TB the schedule is what the planner prunes and budgets on —
    * k·|videos| rows, independent of media bytes.
    *
    * Shape: one metadata projection + one bounded explode (≤ k rows
    * per video); zero shuffles. */
  def frameSchedule(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2 sampled frames, got $k")
    val n = greatest(octet_length(col(textCol).cast(BinaryType))
      .cast(LongType) / 1024L, lit(1L)).cast(LongType)
    df.select(col(idCol).as("doc_id"), n.as("n_frames"))
      .withColumn("slot", explode(array((0 until k).map(i => lit(i.toLong)): _*)))
      // plain integer division == floor here (both operands nonneg)
      .withColumn("frame_idx",
        expr(s"(slot * (n_frames - 1)) div ${k - 1}").cast(LongType))
      .dropDuplicates("doc_id", "frame_idx")
      .select(col("doc_id"), col("n_frames"), col("frame_idx"))
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
