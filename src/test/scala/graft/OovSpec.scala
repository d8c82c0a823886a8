package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** OOV audit (SURVEY.md §2 row 221): hand-computed coverage, the
  * deterministic vocab tie-break, the token-free NULL, occurrence
  * (not type) counting, and partitioning invariance. */
class OovSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def oov(texts: Seq[(Long, String)], k: Int, parts: Int = 1) =
    CorpusOps.oovAudit(texts.toDF("doc_id", "text").repartition(parts),
        col("doc_id"), col("text"), k)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq

  test("hand-computed coverage against a top-2 vocab") {
    // counts: common×4, mid×2, rare×1 → vocab {common, mid}
    val texts = Seq(
      (1L, "common common mid rare"),
      (2L, "common common mid"))
    val got = oov(texts, k = 2)
    assert(got == Seq(
      (1L, 4L, 1L, Some(250000L)),
      (2L, 3L, 0L, Some(0L))))
  }

  test("vocab count ties break to the lexicographically smaller token") {
    // both occur once; k=1 keeps 'alpha'
    val got = oov(Seq((1L, "alpha zeta")), k = 1)
    assert(got == Seq((1L, 2L, 1L, Some(500000L))))
  }

  test("a token-free document reports zeros and NULL ppm") {
    val got = oov(Seq((1L, "!!! ..."), (2L, "word")), k = 5)
    assert(got.head == ((1L, 0L, 0L, None)))
  }

  test("occurrences count, not distinct types") {
    val got = oov(Seq((1L, "x x x common"), (2L, "common common")), k = 1)
    // vocab {common}; doc 1: 4 tokens, 3 oov occurrences
    assert(got.head == ((1L, 4L, 3L, Some(750000L))))
  }

  test("partitioning invariance") {
    val texts = (1L to 300L).map(i => (i, s"w${i % 23} w${i % 7} u${(i * 13) % 41}"))
    assert(oov(texts, 10, parts = 1) == oov(texts, 10, parts = 13))
  }
}
