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

  private def ringMv(keys: Seq[Option[Long]], shards: Int, vper: Int = 64) =
    Placement.ringMovement(keys.toDF("k"), col("k"), shards, vper)
      .orderBy($"shard_old", $"shard_new")
      .as[(Long, Long, Long)].collect().toSeq

  test("ring: growing S -> S+1 only ever moves keys TO the new shard") {
    val got = ringMv(keys, shards = 8)
    assert(got.filter(r => r._1 != r._2).forall(_._2 == 8L), got.toString)
    assert(got.map(_._3).sum == 2000L)
  }

  test("ring: movement fraction is near 1/(S+1) with 64 vnodes") {
    val got = ringMv(keys, shards = 8)
    val frac = got.filter(r => r._1 != r._2).map(_._3).sum.toDouble /
      got.map(_._3).sum
    // vnode load variance is wider than rendezvous' — accept 3x slack
    assert(frac > 0.3 / 9 && frac < 3.0 / 9, s"moved fraction $frac")
  }

  test("ring: the vnode table is sorted and covers every shard") {
    val vn = Placement.ringVnodes(8, 64)
    assert(vn.size == 512)
    assert(vn.map(_._1) == vn.map(_._1).sorted)
    assert(vn.map(_._2).toSet == (0L until 8L).toSet)
  }

  test("ring: keys past the last vnode wrap to the globally first one") {
    // single shard, single vnode: EVERY key maps to shard 0, wrapped
    // or not; with 2 shards x 1 vnode each, keys beyond both
    // positions must land on the globally smallest position's shard
    val vn = Placement.ringVnodes(2, 1)
    val firstShard = vn.head._2
    val got = ringMv((1L to 400L).map(Some(_)), shards = 1, vper = 1)
    // shards=1 -> old ring has one vnode; every key owned by shard 0
    assert(got.forall(_._1 == 0L))
    // and in the 2-shard ring, both shards own someone (wrap works)
    val newOwners = got.map(_._2).toSet
    assert(newOwners.contains(firstShard))
  }
}
