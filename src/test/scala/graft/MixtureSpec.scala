package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MixtureOps

/** Domain-mixture temperature resampling. */
class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // heavily skewed domain masses: big=9000 tokens, small=100
  private def docs = {
    val rows =
      (1 to 90).map(i => ("big", i.toLong, 100L)) ++
      (1 to 10).map(i => ("small", 1000L + i, 10L))
    rows.toDF("domain", "doc_id", "n_tokens")
  }

  test("T=2 flattens the allocation toward small domains") {
    val b = MixtureOps.domainBudgets(docs, $"domain", $"n_tokens",
        totalBudget = 1000L, temperature = 2)
      .select($"domain", $"t_tokens", $"weight", $"budget")
      .as[(String, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    // isqrt weights: big -> 94, small -> 10
    assert(b("big")._3 == 94L && b("small")._3 == 10L)
    // total allocation never exceeds the budget
    assert(b.values.map(_._4).sum <= 1000L)
    // natural share of small = 100/9100 ~ 1.1%; T=2 share = 10/104 ~ 9.6%
    val smallShare = b("small")._4.toDouble / 1000
    assert(smallShare > 0.05, s"small domain share $smallShare not flattened")
    // T=1 is natural proportions
    val n = MixtureOps.domainBudgets(docs, $"domain", $"n_tokens",
        totalBudget = 1000L, temperature = 1)
      .select($"domain", $"budget").as[(String, Long)].collect().toMap
    assert(n("big") == 1000L * 9000L / 9100L && n("small") == 1000L * 100L / 9100L)
  }

  test("chi2 surfaces each domain's signature token, partitioning-invariant") {
    // "common" saturates both domains (no signal); zebra/filler are
    // domain-exclusive and must top their domain's ranking
    val corpus = (
      (1 to 30).map(i => ("a", s"zebra common shared$i")) ++
      (1 to 30).map(i => ("b", s"filler common shared$i")))
      .toDF("domain", "text")
    val top = MixtureOps.characteristicTokens(corpus, $"domain", $"text", topK = 3)
      .filter($"rn" === 1)
      .select($"source", $"token").as[(String, String)].collect().toMap
    assert(top("a") == "zebra" && top("b") == "filler", top.toString)
    // the balanced token never outranks the exclusive ones
    val common = MixtureOps.characteristicTokens(corpus, $"domain", $"text", topK = 3)
      .filter($"token" === "common").count()
    assert(common == 0, "a 50/50 token is not over-represented anywhere")
    val a = MixtureOps.characteristicTokens(corpus, $"domain", $"text")
      .orderBy($"source", $"rn").collect().toSeq
    val b = MixtureOps.characteristicTokens(corpus.repartition(7), $"domain", $"text")
      .orderBy($"source", $"rn").collect().toSeq
    assert(a == b)
  }

  test("draw is a budget-bounded hash prefix, partitioning-invariant") {
    val kept = MixtureOps.temperatureMixture(docs, $"domain", $"doc_id",
      $"n_tokens", totalBudget = 1000L)
    val byDomain = kept.groupBy($"domain")
      .agg(sum($"n_tokens").as("t"), max($"budget").as("bud"), max($"n_tokens").as("mx"))
      .as[(String, Long, Long, Long)].collect()
    // prefix property: the selected mass is under budget + one doc
    byDomain.foreach { case (d, t, bud, mx) =>
      assert(t < bud + mx, s"domain $d overdrawn: $t vs budget $bud")
    }
    val a = kept.select($"doc_id").orderBy($"doc_id").as[Long].collect().toSeq
    val b = MixtureOps.temperatureMixture(docs.repartition(5), $"domain", $"doc_id",
        $"n_tokens", totalBudget = 1000L)
      .select($"doc_id").orderBy($"doc_id").as[Long].collect().toSeq
    assert(a == b)
  }

  private def quotas(ws: Seq[(String, Long)], budget: Long) =
    MixtureOps.apportion(ws.toDF("k", "w"), Seq("k"), "w", budget)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap

  test("apportion: quotas sum exactly to the budget; each is floor or ceil of its share") {
    // shares of 100 over weights 1,1,1 are 33.33.. -> floor sum 99, one +1
    val q = quotas(Seq(("a", 1L), ("b", 1L), ("c", 1L)), 100L)
    assert(q.values.sum == 100L, q.toString)
    assert(q.values.toSet.subsetOf(Set(33L, 34L)), q.toString)
    // skewed weights, prime budget: still exact
    val q2 = quotas(Seq(("a", 7L), ("b", 2L), ("c", 991L)), 9973L)
    assert(q2.values.sum == 9973L, q2.toString)
    // each quota within 1 of the exact share B*w/W
    val wtot = 1000.0
    Seq(("a", 7L), ("b", 2L), ("c", 991L)).foreach { case (k, w) =>
      val exact = 9973L * w / wtot
      assert(q2(k) == math.floor(exact).toLong || q2(k) == math.ceil(exact).toLong,
        s"$k: ${q2(k)} vs $exact")
    }
  }

  test("apportion: zero-weight domains get zero; remainder ties break by key") {
    val q = quotas(Seq(("a", 5L), ("z", 0L), ("b", 5L)), 11L)
    assert(q("z") == 0L, q.toString)
    assert(q.values.sum == 11L, q.toString)
    // a and b have equal remainders; the single bonus unit goes to "a"
    assert(q("a") == 6L && q("b") == 5L, q.toString)
  }

  test("apportion is invariant to input partitioning") {
    val ws = (1 to 50).map(i => (s"d$i", (i * 37 % 13 + 1).toLong))
    val a = MixtureOps.apportion(ws.toDF("k", "w"), Seq("k"), "w", 12345L)
      .orderBy($"k").collect().toSeq
    val b = MixtureOps.apportion(ws.toDF("k", "w").repartition(7), Seq("k"), "w", 12345L)
      .orderBy($"k").collect().toSeq
    assert(a == b && a.map(_.getLong(2)).sum == 12345L)
  }
}
