package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.sources.Tables

/** The mapPartitions batch-decode path must agree with the pure
  * expression path (same stub decode on both). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("batched decode equals expression metadata") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val viaExpr = Multimodal.withMetadata(docs, "doc_id", "text")
    val viaDecode = Multimodal.decode(Multimodal.asMedia(docs, "doc_id", "text")).toDF()
    val joined = viaExpr.join(viaDecode,
      Seq("doc_id", "byte_len", "sha", "width", "height"))
    assert(viaExpr.count() == docs.count())
    assert(joined.count() == docs.count())
  }

  test("frame sampling is deterministic with the expected cadence") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf)
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val frames = Multimodal.frameSample(media, stride = 2)
    // every doc yields at least frame 0; indexes follow the stride
    assert(frames.filter($"frame_idx" === 0).count() == docs.count())
    assert(frames.filter($"frame_idx" % 2 =!= 0).count() == 0)
    // deterministic across runs
    val a = frames.collect().toSet
    val b = Multimodal.frameSample(media, stride = 2).collect().toSet
    assert(a == b)
  }

  // ---- REAL decode path (javax.imageio) on synthetic generated images ----

  /** Deterministic synthetic image: solid fill, encoded via ImageIO. */
  private def mkImage(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("real image decode reads true dimensions from PNG and JPEG headers") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, mkImage(64, 48, 0x336699, "png")),
      Multimodal.MediaRow(2L, mkImage(17, 31, 0xff0000, "jpg")),
      Multimodal.MediaRow(3L, mkImage(320, 240, 0x00ff00, "png")),
      Multimodal.MediaRow(4L, "not an image at all".getBytes("UTF-8"))))
    val out = Multimodal.decodeImageMeta(media).collect()
      .map(d => d.doc_id -> ((d.width, d.height))).toMap
    assert(out == Map(1L -> ((64L, 48L)), 2L -> ((17L, 31L)), 3L -> ((320L, 240L))))
  }

  test("real pixel decode extracts exact channel means on solid fills") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, mkImage(10, 10, 0x102030, "png")),
      Multimodal.MediaRow(2L, mkImage(5, 7, 0xffffff, "png"))))
    val out = Multimodal.decodeImageFeatures(media).collect()
      .map(f => f.doc_id -> ((f.mean_r, f.mean_g, f.mean_b))).toMap
    // solid fill → mean == fill value exactly; ×1000 integer image
    assert(out(1L) == ((0x10 * 1000L, 0x20 * 1000L, 0x30 * 1000L)))
    assert(out(2L) == ((255000L, 255000L, 255000L)))
  }

  test("real resize fits the box, preserves aspect, and round-trips through ImageIO") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, mkImage(640, 480, 0x808080, "png")),
      Multimodal.MediaRow(2L, mkImage(100, 300, 0x223344, "png"))))
    val out = Multimodal.imageResize(media, 224).collect()
      .map(r => r.doc_id -> r).toMap
    assert((out(1L).out_w, out(1L).out_h) == ((224L, 168L)))
    assert((out(2L).out_w, out(2L).out_h) == ((74L, 224L)))
    // the emitted payload is a decodable PNG with the claimed dims
    val rt = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).png))
    assert(rt.getWidth == 224 && rt.getHeight == 168)
  }

  /** Deterministic synthetic WAV: 16-bit PCM mono square wave. */
  private def mkWav(sampleRate: Int, nFrames: Int, amp: Short, period: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s: Short = if ((i / period) % 2 == 0) amp else (-amp).toShort
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real audio decode reads true header metadata from WAV bytes") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, mkWav(8000, 4000, 1000, 100)),
      Multimodal.MediaRow(2L, mkWav(16000, 16000, 500, 50)),
      Multimodal.MediaRow(3L, "definitely not audio".getBytes("UTF-8"))))
    val out = Multimodal.decodeAudioMeta(media).collect()
      .map(a => a.doc_id -> a).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == Multimodal.AudioMeta(1L, 8000L, 1L, 4000L, 500L))
    assert(out(2L) == Multimodal.AudioMeta(2L, 16000L, 1L, 16000L, 1000L))
  }

  test("real audio feature extraction is exact on a square wave") {
    import spark.implicits._
    // 4000 frames, amplitude 1000, half-period 100 → 39 sign flips;
    // square wave RMS == amplitude exactly
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, mkWav(8000, 4000, 1000, 100))))
    val f = Multimodal.decodeAudioFeatures(media).collect().head
    assert(f.peak == 1000L)
    assert(f.zero_crossings == 39L)
    assert(f.rms_x1000 == 1000000L)
  }

  test("resize preserves aspect and fits the box") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf)
    val r = Multimodal.withResize(
      Multimodal.withMetadata(docs, "doc_id", "text"), 224)
    // fits the box; the binding dimension lands on 224 (or 223 — floor
    // of w*(224/w) can round just under)
    val bad = r.filter($"out_w" > 224 || $"out_h" > 224 ||
      (greatest($"out_w", $"out_h") < 223 && $"width" >= 224))
    assert(bad.count() == 0)
  }
}
