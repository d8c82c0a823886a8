package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.plans.CountMinAgg
import graft.sources.Tables

/** Count-min sketch native aggregate (§2.11). */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toks =
    Tables.documents(spark, TestSpark.sf)
      .select(explode(TextFunctions.tokens($"text")).as("t"))

  test("estimates never undercount, even at a collision-forcing width") {
    val sketch = toks.agg(CountMinAgg.count_min($"t", 4, 8).as("sk"))
    val bad = toks.groupBy($"t").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .withColumn("est", CountMinAgg.estimate($"sk", $"t", 4, 8))
      .filter($"est" < $"exact")
      .count()
    assert(bad == 0)
  }

  test("a wide sketch degenerates to exact counting") {
    val sketch = toks.agg(CountMinAgg.count_min($"t", 4, 1 << 16).as("sk"))
    val off = toks.groupBy($"t").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .withColumn("est", CountMinAgg.estimate($"sk", $"t", 4, 1 << 16))
      .filter($"est" =!= $"exact")
      .count()
    assert(off == 0)
  }

  test("sketch cells are partitioning-invariant and preserve total mass") {
    def cells(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(CountMinAgg.count_min($"t", 4, 16).as("sk"))
        .head().getSeq[Long](0)
    val a = cells(toks)
    val b = cells(toks.repartition(13))
    assert(a == b)
    val n = toks.count()
    (0 until 4).foreach { r =>
      assert(a.slice(r * 16, (r + 1) * 16).sum == n,
        s"row $r must hold every insertion exactly once")
    }
  }

  test("the sketch aggregates a stream: complete-mode cells equal the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val q = ms.toDS().toDF("t")
      .agg(CountMinAgg.count_min($"t", 2, 8).as("sk"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_stream").start()
    try {
      ms.addData("a", "b", "a")
      q.processAllAvailable()
      ms.addData("c", "a")
      q.processAllAvailable()
      val streamed = spark.table("cms_stream").head().getSeq[Long](0)
      val batch = Seq("a", "b", "a", "c", "a").toDF("t")
        .agg(CountMinAgg.count_min($"t", 2, 8).as("sk")).head().getSeq[Long](0)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sketches over disjoint batches add elementwise (delta-state additivity)") {
    val withId = toks.withColumn("i", monotonically_increasing_id())
    val b1 = withId.filter($"i" % 2 === 0).select($"t")
    val b2 = withId.filter($"i" % 2 === 1).select($"t")
    def cells(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(CountMinAgg.count_min($"t", 2, 16).as("sk")).head().getSeq[Long](0)
    val summed = cells(b1).zip(cells(b2)).map { case (x, y) => x + y }
    assert(cells(toks) == summed)
  }
}
