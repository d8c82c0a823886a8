package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters
import graft.plans.SpaceSavingAgg

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

  test("sketch estimates overestimate true counts (the completeness invariant)") {
    val sk = skewed.repartition(8)
      .agg(SpaceSavingAgg.spaceSaving($"token", 64).as("sk"))
      .select($"sk.total", explode($"sk.items").as("it"))
      .select($"total", $"it.token", $"it.est")
      .as[(Long, String, Long)].collect()
    assert(sk.head._1 == 10000)
    val est = sk.map(r => r._2 -> r._3).toMap
    assert(est("hh") >= 3000, s"hh estimate ${est.get("hh")} must overestimate 3000")
    assert(est.getOrElse("mid", 0L) >= 500)
  }

  test("exact heavy hitters survive aggressive eviction (capacity 10x under cardinality)") {
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

  test("sketch buffer round-trips through serialization") {
    val agg = SpaceSavingAgg(null, capacity = 4)
    val buf = agg.createAggregationBuffer()
    buf.total = 42L
    buf.counts.update("alpha", 7L)
    buf.counts.update("beta", 3L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.total == 42L && back.counts == buf.counts)
  }
}
