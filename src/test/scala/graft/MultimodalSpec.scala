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
