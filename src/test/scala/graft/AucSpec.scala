package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classify

/** Exact ROC-AUC (SURVEY.md §2 row 194): hand-computed Mann–Whitney
  * pair counts with midrank ties, the perfect/reversed/constant
  * anchors, one-class degeneracy, NULL exclusion, and partitioning
  * invariance. */
class AucSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def auc(rows: Seq[(java.lang.Long, java.lang.Long)], parts: Int = 1) =
    Classify.rocAuc(rows.toDF("score", "y").repartition(parts), "score", "y")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head

  test("hand-computed: ties count half") {
    // pos scores {3, 2}, neg scores {2, 1}:
    // pairs (3,2)> (3,1)> (2,2)= (2,1)> → U = 3 + 0.5 = 3.5
    // num = 2U = 7, den = 2·2·2 = 8
    val got = auc(Seq((3L: java.lang.Long, 1L: java.lang.Long),
      (2L, 1L), (2L, -1L), (1L, -1L)))
    assert(got == ((2L, 2L, 7L, 8L, Some(7d / 8d))))
  }

  test("perfect ranking gives AUC exactly 1") {
    val rows = (1L to 20L).map(i =>
      ((i + (if (i % 2 == 0) 100L else 0L)): java.lang.Long,
        (if (i % 2 == 0) 1L else -1L): java.lang.Long))
    val got = auc(rows)
    assert(got._3 == got._4 && got._5.contains(1d))
  }

  test("reversed ranking gives AUC exactly 0") {
    val got = auc(Seq((1L: java.lang.Long, 1L: java.lang.Long), (2L, -1L), (3L, -1L)))
    assert(got._3 == 0L && got._5.contains(0d))
  }

  test("all scores tied gives AUC exactly 1/2") {
    val got = auc(Seq((5L: java.lang.Long, 1L: java.lang.Long), (5L, -1L), (5L, 1L), (5L, -1L)))
    assert(got._3 * 2 == got._4 && got._5.contains(0.5d))
  }

  test("one-class input reports NULL auc, zero denominator") {
    val got = auc(Seq((1L: java.lang.Long, 1L: java.lang.Long), (2L, 1L)))
    assert(got == ((2L, 0L, 0L, 0L, None)))
  }

  test("NULL score and NULL label rows are excluded") {
    val withNulls: Seq[(java.lang.Long, java.lang.Long)] =
      Seq[(Option[Long], Option[Long])]((Some(3L), Some(1L)), (Some(2L), Some(1L)),
        (Some(2L), Some(-1L)), (Some(1L), Some(-1L)), (None, Some(1L)), (Some(7L), None))
        .map { case (a, b) =>
          (a.map(java.lang.Long.valueOf).orNull, b.map(java.lang.Long.valueOf).orNull)
        }
    assert(auc(withNulls) == ((2L, 2L, 7L, 8L, Some(7d / 8d))))
  }

  test("continuous double scores: exact vs the single-window form, and no corpus-wide window") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // 50k DISTINCT doubles (hash-derived, deterministic): the shape
    // that used to ride ONE unpartitioned window task
    val scored = spark.range(50000).select(
      (xxhash64(col("id")).cast("double") / 1e18).as("score"),
      when(pmod(col("id"), lit(3)) === 0, 1L).otherwise(-1L).as("y"))
    val got = Classify.rocAuc(scored, "score", "y")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head

    // reference: the plain single-window formulation, computed inline
    val byScore = scored.groupBy(col("score").as("s"))
      .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("pos"),
        sum(when(col("y") =!= 1L, 1L).otherwise(0L)).as("neg"))
    val w = Window.orderBy(col("s")).rowsBetween(Window.unboundedPreceding, -1)
    val ref = byScore
      .withColumn("nb", coalesce(sum(col("neg")).over(w), lit(0L)))
      .agg(sum(col("pos")).as("np"), sum(col("neg")).as("nn"),
        sum(col("pos") * col("nb") * 2L + col("pos") * col("neg")).as("num"))
      .as[(Long, Long, Long)].collect().head
    assert((got._1, got._2, got._3) == ref && got._4 == 2L * ref._1 * ref._2)

    // plan pin: every window key is engine-internal (__b) — no window
    // orders the raw score frame globally; the per-score cumsum is
    // partitioned by the bucket
    val p = Classify.rocAuc(scored, "score", "y")
      .queryExecution.executedPlan.toString
    assert("windowspecdefinition\\((?!__)".r.findFirstIn(p).isEmpty, p)
    assert("windowspecdefinition\\(__b#\\d+[^,]*, s#".r.findFirstIn(p).nonEmpty, p)
  }

  test("partitioning invariance") {
    val rows = (1L to 500L).map(i =>
      (((i * 37) % 91): java.lang.Long, (if (i % 3 == 0) 1L else -1L): java.lang.Long))
    assert(auc(rows, parts = 1) == auc(rows, parts = 13))
  }
}
