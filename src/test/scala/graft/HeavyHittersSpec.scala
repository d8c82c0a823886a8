package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters
import graft.plans.SpaceSavingTopK.topk_freq

/** Space-Saving sketch + exact-recount frequent items (§2.5). */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Skewed synthetic stream: token "hh" appears 3000 times (30%),
    * "mid" 500, and 6500 singletons — far more distinct items than the
    * sketch capacity, so evictions are constant. */
  private def skewed = {
    val rows = Seq.fill(3000)("hh") ++ Seq.fill(500)("mid") ++
      (0 until 6500).map(i => s"tail_$i")
    rows.toDF("token")
  }

  test("merged estimates overestimate items that survive every partial sketch") {
    // NOTE this holds only for everywhere-surviving items: an item
    // evicted from some partition's partial contributes zero there, so
    // merged estimates CAN undercount in general — which is why
    // heavyHitters recounts every sketched item instead of filtering
    // on these estimates (see the operator's scaladoc).
    val est = skewed.repartition(8)
      .agg(topk_freq($"token", 64, 64).as("items"))
      .select(explode($"items").as("it"))
      .select($"it.item", $"it.cnt")
      .as[(String, Long)].collect().toMap
    assert(est("hh") >= 3000, s"hh estimate ${est.get("hh")} must overestimate 3000")
    assert(est.getOrElse("mid", 0L) >= 500)
  }

  test("exact heavy hitters survive aggressive eviction (capacity 100x under cardinality)") {
    // k=20 -> threshold 10000/20 = 500: exactly {hh, mid}
    val got = HeavyHitters.heavyHitters(skewed.repartition(8), $"token", k = 20, capacity = 64)
      .as[(String, Long)].collect().toMap
    assert(got == Map("hh" -> 3000L, "mid" -> 500L))
  }

  test("result is exact and partitioning-invariant") {
    val a = HeavyHitters.heavyHitters(skewed.repartition(3), $"token", k = 25)
      .orderBy($"token").as[(String, Long)].collect().toSeq
    val b = HeavyHitters.heavyHitters(skewed.repartition(17).orderBy(rand(7)), $"token", k = 25)
      .orderBy($"token").as[(String, Long)].collect().toSeq
    assert(a == b)
    assert(a.toMap.apply("hh") == 3000L)
  }

  test("nulls are excluded from both the sketch and the total") {
    val withNulls = skewed.union(Seq.fill(5000)(null: String).toDF("token"))
    // if nulls counted toward total (15000), hh at 3000 would still pass k=5
    // (3000*5 >= 15000) but mid at 500 would not; with the correct total
    // (10000) k=20 keeps both — pin the correct behavior
    val got = HeavyHitters.heavyHitters(withNulls, $"token", k = 20, capacity = 64)
      .as[(String, Long)].collect().toMap
    assert(got == Map("hh" -> 3000L, "mid" -> 500L))
  }
}
