package graft

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
}
