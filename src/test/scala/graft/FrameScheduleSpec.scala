package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Uniform frame-sampling schedule (SURVEY.md §2 row 228): endpoint
  * inclusion, even spacing, short-clip collapse, the single-frame
  * degenerate, and the k-bound. */
class FrameScheduleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def schedule(sizes: Seq[(Long, Int)], k: Int) =
    Multimodal.frameSchedule(
        sizes.map { case (id, kb) => (id, "x" * (kb * 1024)) }.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .orderBy($"doc_id", $"frame_idx")
      .as[(Long, Long, Long)].collect().toSeq

  test("first and last frames are always included; spacing is even") {
    // 71 frames, k=8: idx_i = floor(i·70/7) = 0,10,20,...,70
    val got = schedule(Seq(1L -> 71), k = 8)
    assert(got.map(_._3) == (0L to 70L by 10L))
    assert(got.head._2 == 71L)
  }

  test("a clip shorter than k collapses to its distinct frames") {
    val got = schedule(Seq(1L -> 3), k = 8)
    assert(got.map(_._3) == Seq(0L, 1L, 2L))
  }

  test("a single-frame clip yields exactly frame 0") {
    val got = schedule(Seq(1L -> 1), k = 8)
    assert(got == Seq((1L, 1L, 0L)))
  }

  test("never more than k frames, indices always in range") {
    val got = schedule((1L to 20L).map(i => i -> (i * 3).toInt), k = 5)
    got.groupBy(_._1).foreach { case (_, g) =>
      assert(g.size <= 5)
      assert(g.forall(r => r._3 >= 0 && r._3 < r._2))
    }
  }
}
