package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classify

/** Batch-perceptron classifier (SURVEY.md §2 row 118): hand-traced
  * update arithmetic, convergence on separable data, determinism
  * under repartitioning, and the projection-only scoring plan. */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one batch update matches the hand-traced sum of misclassified y·x") {
    // features (1, x); initial w = 0 → every point has y·dot = 0 → all update
    val df = Seq((1L, 3L), (1L, 5L), (-1L, 2L)).toDF("y", "x")
    val feats = Seq(lit(1L), $"x".cast(LongType))
    val w1 = Classify.trainPerceptron(df, feats, $"y", iters = 1)
    // sum y*1 = 1+1-1 = 1; sum y*x = 3+5-2 = 6
    assert(w1 == Seq(1L, 6L))
  }

  test("converges to zero errors on linearly separable data") {
    // y = +1 iff x > 10, margin 6 wide — separable with bias
    val df = ((1 to 20).map(i => (1L, 13L + i % 3)) ++
      (1 to 20).map(i => (-1L, 7L - i % 3))).toDF("y", "x")
    val feats = Seq(lit(1L), $"x".cast(LongType))
    val w = Classify.trainPerceptron(df, feats, $"y", iters = 10)
    val errs = df.filter($"y" =!= Classify.predict(feats, w)).count()
    assert(errs == 0, s"w=$w errs=$errs")
  }

  test("training is invariant to partitioning (integer batch sums)") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val label = when($"lang" === "en", 1L).otherwise(-1L)
    val a = Classify.trainPerceptron(docs.repartition(1),
      Classify.charFeatures($"text"), label, iters = 3)
    val b = Classify.trainPerceptron(docs.repartition(13, $"doc_id"),
      Classify.charFeatures($"text"), label, iters = 3)
    assert(a == b)
  }

  test("scoring is a projection: no exchange, no join") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val p = docs.select(Classify.predict(Classify.charFeatures($"text"),
        Seq(1L, 2L, 3L, 4L, 5L)).as("pred"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"), p)
  }
}
