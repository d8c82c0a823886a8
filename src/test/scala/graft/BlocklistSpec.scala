package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Blocklist
import graft.sources.Tables

/** Blocklist phrase filtering (§2.11). */
class BlocklistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "Totally clean prose about nothing"),
    (2L, "the SLOW   merge path ran a slow merge twice"),
    (3L, "ban this phrase and ban this phrase again"),
    (4L, "a lowercase ban this Phrase here"),
  ).toDF("doc_id", "text")

  test("phrases match at token boundaries after normalization, with counts") {
    val hits = Blocklist.phraseHits(docs, $"doc_id", $"text",
        Seq("slow merge", "ban this phrase"))
      .as[(Long, String, Long)].collect().toSet
    assert(hits == Set(
      (2L, "slow merge", 2L),       // case/whitespace-normalized + repeat
      (3L, "ban this phrase", 2L),
      (4L, "ban this phrase", 1L)))
  }

  test("a substring that is not a token sequence does not match") {
    // "low merge" is inside the STRING "slow merge" but "low" is not a
    // token — boundary semantics must reject it
    val hits = Blocklist.phraseHits(docs, $"doc_id", $"text", Seq("low merge"))
    assert(hits.count() == 0)
  }

  test("filter returns exactly the unflagged complement") {
    val clean = Blocklist.blocklistFilter(docs, $"doc_id", $"text",
        Seq("slow merge", "ban this phrase"))
      .select($"doc_id").as[Long].collect().toSet
    assert(clean == Set(1L))
  }

  test("an empty blocklist is a no-op: nothing flagged, everything kept") {
    assert(Blocklist.phraseHits(docs, $"doc_id", $"text", Seq.empty).count() == 0)
    val kept = Blocklist.blocklistFilter(docs, $"doc_id", $"text", Seq.empty)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
  }

  test("blank and duplicate phrases are rejected") {
    intercept[IllegalArgumentException] {
      Blocklist.phraseHits(docs, $"doc_id", $"text", Seq("ok", "  "))
    }
    intercept[IllegalArgumentException] {
      Blocklist.phraseHits(docs, $"doc_id", $"text", Seq("A  b", "a b"))
    }
  }

  test("audit summary is partitioning-invariant on real docs") {
    val base = Tables.documents(spark, TestSpark.sf)
    def run(df: org.apache.spark.sql.DataFrame) =
      Blocklist.flagged(df, $"doc_id", $"text", Blocklist.AuditPhrases)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(base).nonEmpty)
    assert(run(base) == run(base.repartition(7, $"source")))
  }

  test("plan: phrase lists broadcast; no shuffle join anywhere") {
    val plan = Blocklist.flagged(Tables.documents(spark, TestSpark.sf),
        $"doc_id", $"text", Blocklist.AuditPhrases)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), s"plan:\n$plan")
  }
}
