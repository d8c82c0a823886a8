package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** Pseudonymization collision audit (SURVEY.md §2 row 226):
  * determinism, salt separation, the birthday-scale collision count,
  * distinct-id semantics, and the collision-only output contract. */
class PseudonymSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def audit(ids: Seq[Long], salt: String, bits: Int) =
    Privacy.pseudonymCollisions(ids.toDF("u"), col("u"), salt, bits)
      .orderBy($"pseudonym")
      .as[(Long, Long, String)].collect().toSeq

  test("the same ids always collide identically — deterministic mapping") {
    val ids = (1L to 3000L)
    assert(audit(ids, "s1", 10) == audit(ids, "s1", 10))
  }

  test("a different salt produces a different collision pattern") {
    val ids = (1L to 3000L)
    assert(audit(ids, "s1", 10) != audit(ids, "s2", 10))
  }

  test("collision volume sits at birthday scale for the width") {
    // n=3000 into 2^10 buckets: expected collisions make most buckets
    // multi-member; with 62 bits there must be none
    val ids = (1L to 3000L)
    assert(audit(ids, "s", 10).nonEmpty)
    assert(audit(ids, "s", 62).isEmpty)
  }

  test("duplicate input rows don't inflate collision counts") {
    val ids = Seq.fill(50)(7L) ++ Seq.fill(50)(8L)
    val got = audit(ids, "s", 1)
    // 2 distinct ids into 2 buckets: either they collide (one row,
    // n_ids=2) or they don't (no rows) — never counts of 50
    assert(got.forall(_._2 == 2L))
  }

  test("members are sorted and comma-joined") {
    val ids = (1L to 2000L)
    val got = audit(ids, "s", 8)
    got.foreach { r =>
      val m = r._3.split(",").toSeq
      assert(m.size == r._2 && m == m.sorted)
    }
  }
}
