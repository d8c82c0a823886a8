package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.VectorKernels._
import graft.sources.Tables

/** Codegen'd array-dot kernels: parity with the HOF formulation they
  * replaced, null semantics, and interpreted == codegen. */
class VectorKernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dot_long equals the aggregate(zip_with(...)) formulation on real vectors") {
    val e = Tables.embeddings(spark, TestSpark.sf).limit(200)
      .select($"vec_id",
        transform($"embedding", x => floor(x.cast(DoubleType) * 1e6).cast(LongType)).as("q"))
    val both = e.select($"vec_id",
        dot_long($"q", reverse($"q")).as("kernel"),
        aggregate(zip_with($"q", reverse($"q"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("hof"))
    assert(both.filter(!($"kernel" <=> $"hof")).count() == 0)
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)),   // 11
      (2L, Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)), // elem null
      (3L, Seq[java.lang.Long](1L), Seq[java.lang.Long](3L, 4L))        // len mismatch
    ).toDF("id", "a", "b")
      .union(Seq((4L, null.asInstanceOf[Seq[java.lang.Long]], Seq[java.lang.Long](1L)))
        .toDF("id", "a", "b"))
    val out = df.select($"id", dot_long($"a", $"b").as("d"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(11L), 2L -> None, 3L -> None, 4L -> None))
  }

  test("mis-typed input fails analysis instead of reading garbage") {
    val ints = Seq((1, Seq(1, 2), Seq(3, 4))).toDF("id", "a", "b")
    val e = intercept[Exception] {
      ints.select(dot_long($"a", $"b")).collect() // array<int> into a long kernel
    }
    assert(e.getMessage.contains("graft_dot_long"), e.getMessage)
    // and the documented usage — an explicit cast — still analyzes
    ints.select(dot_long($"a".cast("array<long>"), $"b".cast("array<long>")))
      .collect()
  }

  test("dot_double and l2_sq match driver-side arithmetic bit-for-bit") {
    val a = Array(1.5, -2.25, 3.0)
    val b = Array(0.5, 4.0, -1.25)
    val expDot = a.zip(b).map { case (x, y) => x * y }.sum
    val expL2 = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val row = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(dot_double($"a", $"b"), l2_sq($"a", $"b"))
      .as[(Double, Double)].head()
    assert(row._1 == expDot && row._2 == expL2)
  }

  test("interpreted evaluation agrees with codegen") {
    val data = Seq((Seq(3L, -5L, 7L), Seq(2L, 11L, -1L)))
    def run(): (Long, Double) = data.toDF("a", "b")
      .select(dot_long($"a", $"b"),
        dot_double($"a".cast(ArrayType(DoubleType)), $"b".cast(ArrayType(DoubleType))))
      .as[(Long, Double)].head()
    val codegen = run()
    val interpreted = withSQLConf(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")(run())
    assert(codegen == interpreted && codegen._1 == 3L * 2 + (-5L) * 11 + 7L * (-1))
  }

  private def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
