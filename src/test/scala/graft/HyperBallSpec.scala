package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** HyperBall (SURVEY.md §2 row 302): the max-merge recurrence must
  * make each node's registers at radius r EXACTLY the HLL registers of
  * its true ball B(v, r) — that identity (not an approximation) is
  * what makes the sketch-propagation algorithm correct; the estimate's
  * error is all in the final (non-gated) cardinality read-out. */
class HyperBallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  //  1 -> 2 -> 3 -> 4,  1 -> 3  (so B(1,1) = {1,2,3}), 5 isolated-ish: 4 -> 5
  private lazy val edges =
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (4L, 5L)).toDF("src", "dst")

  private def ballsOf(maxR: Int): Map[(Long, Long), Set[Long]] = {
    val adj = Map(1L -> Set(2L, 3L), 2L -> Set(3L), 3L -> Set(4L), 4L -> Set(5L), 5L -> Set.empty[Long])
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    nodes.flatMap { v =>
      var ball = Set(v)
      (0 to maxR).map { r =>
        val cur = ((v, r.toLong), ball)
        ball = ball ++ ball.flatMap(adj.getOrElse(_, Set.empty[Long]))
        cur
      }
    }.toMap
  }

  /** The registers of an explicit node set, computed directly from the
    * PolyHash64 contract (p = 4) — the spec's independent oracle. */
  private def registersOf(items: Set[Long], p: Int = 4): Map[Long, Long] =
    items.toSeq.map { v =>
      val h = graft.plans.PolyHash64.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"hll|$v"))
      val bucket = java.lang.Math.floorMod(h, 1L << p)
      val w = h >>> p
      val rho = if (w == 0L) (64 - p + 1).toLong
        else java.lang.Long.numberOfTrailingZeros(w) + 1L
      bucket -> rho
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }

  test("register sums at every radius equal the HLL of the exact ball") {
    val got = GraphOps.hyperBall(edges, "src", "dst", p = 4, maxRadius = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val balls = ballsOf(3)
    for (((v, r), ball) <- balls) {
      val regs = registersOf(ball)
      assert(got((v, r)) == (regs.values.sum, regs.size.toLong),
        s"node $v radius $r: ball $ball")
    }
  }

  test("state is monotone in radius and reaches a fixpoint at the eccentricity") {
    val got = GraphOps.hyperBall(edges, "src", "dst", p = 4, maxRadius = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (v <- 1L to 5L; r <- 0L until 6L)
      assert(got((v, r)) <= got((v, r + 1)))
    // node 1's ball saturates at radius 4 (1->2->3->4->5): beyond it,
    // the max-merge is a no-op
    assert(got((1L, 4L)) == got((1L, 6L)))
  }

  test("self-loops and duplicate edges do not change any ball") {
    val noisy = edges
      .unionAll(Seq((1L, 1L), (1L, 2L), (3L, 4L)).toDF("src", "dst"))
    val a = GraphOps.hyperBall(edges, "src", "dst", p = 4, maxRadius = 2)
      .orderBy("node", "radius").collect().toSeq
    val b = GraphOps.hyperBall(noisy, "src", "dst", p = 4, maxRadius = 2)
      .orderBy("node", "radius").collect().toSeq
    assert(a == b)
  }
}
