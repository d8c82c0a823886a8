package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Percolate

/** Stored-query percolation (SURVEY.md §2 row 183): AND semantics,
  * must-not veto, set semantics, multi-query fan-out, and
  * partitioning invariance. */
class PercolateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def perc(docs: Seq[(Long, String)],
                   qs: Seq[(Long, Seq[String], Seq[String])], parts: Int = 1) =
    Percolate.percolate(docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", qs)
      .orderBy($"query_id", $"doc_id")
      .as[(Long, Long)].collect().toSeq

  test("all must terms required, any order, any distance") {
    val docs = Seq(
      (1L, "scan the big table now"),
      (2L, "table only"),
      (3L, "scan only"))
    assert(perc(docs, Seq((1L, Seq("table", "scan"), Nil))) == Seq((1L, 1L)))
  }

  test("must-not vetoes an otherwise matching doc") {
    val docs = Seq((1L, "table scan slow"), (2L, "table scan fast"))
    assert(perc(docs, Seq((1L, Seq("table", "scan"), Seq("slow")))) ==
      Seq((1L, 2L)))
  }

  test("any single must-not term vetoes") {
    val docs = Seq((1L, "spark batch"), (2L, "spark stream"), (3L, "spark x"))
    assert(perc(docs, Seq((3L, Seq("spark"), Seq("batch", "stream")))) ==
      Seq((3L, 3L)))
  }

  test("repeated tokens count once (set semantics)") {
    val docs = Seq((1L, "table table table"))
    assert(perc(docs, Seq((1L, Seq("table", "scan"), Nil))) == Seq.empty)
  }

  test("a doc fans out to every query it satisfies") {
    val docs = Seq((1L, "table scan customer value spark"))
    val got = perc(docs, Percolate.Stored)
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("duplicate must terms in the query spec are harmless") {
    val docs = Seq((1L, "table scan"))
    assert(perc(docs, Seq((1L, Seq("table", "table", "scan"), Nil))) ==
      Seq((1L, 1L)))
  }

  test("case folds; punctuation is transparent") {
    val docs = Seq((1L, "Table, SCAN!"))
    assert(perc(docs, Seq((1L, Seq("table", "scan"), Nil))) == Seq((1L, 1L)))
  }

  test("partitioning invariance") {
    val docs = (1L to 60L).map(i =>
      (i, s"table w${i % 5} ${if (i % 3 == 0) "scan" else "x"} ${if (i % 4 == 0) "slow" else "y"}"))
    assert(perc(docs, Percolate.Stored, parts = 1) ==
      perc(docs, Percolate.Stored, parts = 11))
  }
}
