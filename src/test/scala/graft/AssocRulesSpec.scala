package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AssocRules

/** Association rules (SURVEY.md §2 row 180): hand-computed
  * support/confidence/lift, Apriori pruning, set semantics,
  * direction asymmetry, and partitioning invariance. */
class AssocRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rules(docs: Seq[(Long, String)], pct: Int, parts: Int = 1) =
    AssocRules.associationRules(
        docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text", pct)
      .orderBy($"antecedent", $"consequent")
      .as[(String, String, Long, Long, Long, Double, Long, Long)]
      .collect().toSeq

  private val basket = Seq(
    (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b"))

  test("hand-computed support, confidence, lift") {
    // N=4, df: a=3 b=3 c=1; 50% → frequent {a,b}; pair (a,b) s=2
    val got = rules(basket, pct = 50)
    assert(got == Seq(
      ("a", "b", 2L, 3L, 3L, 2.0 / 3, 8L, 9L),
      ("b", "a", 2L, 3L, 3L, 2.0 / 3, 8L, 9L)))
  }

  test("Apriori pruning: infrequent token never enters a rule") {
    assert(rules(basket, pct = 50).forall(r =>
      r._1 != "c" && r._2 != "c"))
  }

  test("pair support threshold prunes frequent-but-uncorrelated pairs") {
    // a and b each frequent, never together
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
    assert(rules(docs, pct = 50) == Seq.empty)
  }

  test("set semantics: repeats within a doc count once") {
    val docs = Seq((1L, "a a a b"), (2L, "a b b"))
    val got = rules(docs, pct = 100)
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq(("a", "b", 2L), ("b", "a", 2L)))
  }

  test("direction asymmetry when dfs differ") {
    // N=4: a in 3 docs, b in 2, both in 2
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a"), (4L, "z z a b z"))
    val got = rules(docs, pct = 50)
    val ab = got.find(r => r._1 == "a" && r._2 == "b").get
    val ba = got.find(r => r._1 == "b" && r._2 == "a").get
    assert(ab._3 == ba._3, "support symmetric")
    assert(ab._6 < ba._6, "confidence directional: df(a) > df(b)")
  }

  test("partitioning invariance") {
    val docs = (1L to 60L).map(i =>
      (i, s"base w${i % 3} w${i % 4} ${if (i % 2 == 0) "even" else "odd"}"))
    assert(rules(docs, 10, parts = 1) == rules(docs, 10, parts = 13))
  }
}
