package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** JL random projection (SURVEY.md §2 row 191): exact integer
  * projection vs a hand computation, determinism across seeds and
  * runs, shape, and a distance-preservation sanity band. */
class JlProjectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("projection equals the brute-force integer dot") {
    val vec = Seq(0.5f, -1.25f, 2.0f)
    val df = Seq((1L, vec)).toDF("vec_id", "embedding")
    val got = VectorOps.jlProject(df, "vec_id", "embedding", 3, 4, seed = 7L)
      .orderBy($"dim").as[(Long, Long, Long)].collect().toSeq
    val r = VectorOps.jlMatrix(3, 4, 7L)
    val q = vec.map(v => math.floor(v.toDouble * 1000000).toLong)
    val want = r.zipWithIndex.map { case (row, j) =>
      (1L, j.toLong, row.zip(q).map { case (a, b) => a * b }.sum) }
    assert(got == want)
  }

  test("deterministic across runs; different seeds differ") {
    val df = Seq((1L, Seq.fill(8)(0.3f))).toDF("vec_id", "embedding")
    def run(seed: Long) =
      VectorOps.jlProject(df, "vec_id", "embedding", 8, 4, seed)
        .orderBy($"dim").as[(Long, Long, Long)].collect().toSeq
    assert(run(7L) == run(7L))
    assert(run(7L) != run(8L))
  }

  test("shape: outDim rows per vector") {
    val df = (1L to 5L).map(i => (i, Seq.fill(8)(i.toFloat / 10)))
      .toDF("vec_id", "embedding")
    val got = VectorOps.jlProject(df, "vec_id", "embedding", 8, 4)
    assert(got.count() == 20L)
    assert(got.groupBy("id").count().collect().forall(_.getLong(1) == 4L))
  }

  test("distances survive within a loose JL band on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, TestSpark.sf).limit(40)
    val orig = e.as[(Long, Seq[Float], Int)].collect()
      .map { case (id, v, _) => id -> v.map(_.toDouble) }.toMap
    val proj = VectorOps.jlProject(e, "vec_id", "embedding", 64, 16)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3.toDouble) }
    def d(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ids = orig.keys.toSeq.sorted
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      od = d(orig(a), orig(b)) if od > 0
    } yield d(proj(a).toSeq, proj(b).toSeq) / od
    // a fixed scale factor (1e3·1e6·√(in/out)-ish) times (1±distortion):
    // the RATIO SPREAD is what JL bounds — max/min stays small
    val spread = ratios.max / ratios.min
    assert(spread < 3.0, s"spread=$spread over ${ratios.size} pairs")
  }
}
