package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Placement

/** Rendezvous placement audit (SURVEY.md §2 row 202): the minimal-
  * movement property, the ~1/(N+1) movement fraction, key dedup and
  * NULL exclusion, conservation, and partitioning invariance. */
class PlacementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mv(keys: Seq[Option[Long]], nodes: Int, parts: Int = 1) =
    Placement.rendezvousMovement(
        keys.toDF("k").repartition(parts), col("k"), nodes)
      .orderBy($"shard_old", $"shard_new")
      .as[(Long, Long, Long)].collect().toSeq

  private val keys = (1L to 2000L).map(Some(_))

  test("no key moves between surviving nodes — only to the added one") {
    val got = mv(keys, nodes = 8)
    assert(got.filter(r => r._1 != r._2).forall(_._2 == 8L))
  }

  test("the movement fraction is near 1/(N+1)") {
    val got = mv(keys, nodes = 8)
    val moved = got.filter(r => r._1 != r._2).map(_._3).sum.toDouble
    val frac = moved / got.map(_._3).sum
    assert(frac > 0.5 / 9 && frac < 2.0 / 9, s"moved fraction $frac")
  }

  test("all keys are conserved and every shard id is in range") {
    val got = mv(keys, nodes = 8)
    assert(got.map(_._3).sum == 2000L)
    assert(got.forall(r => r._1 >= 0 && r._1 < 8 && r._2 >= 0 && r._2 <= 8))
  }

  test("placement is per distinct key: duplicates and NULLs don't count") {
    val got = mv(Seq(Some(7L), Some(7L), Some(7L), None), nodes = 3)
    assert(got.map(_._3).sum == 1L)
  }

  test("partitioning invariance") {
    assert(mv(keys, 8, parts = 1) == mv(keys, 8, parts = 13))
  }
}
