package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.ScalarQuant
import graft.plans.VectorKernels.dot_long
import graft.sources.Tables

/** SQ8 scalar quantization (§2 row 110): grid bounds, reconstruction
  * error, compressed-domain search vs full-precision order, and
  * partitioning invariance. */
class ScalarQuantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  lazy val scale = ScalarQuant.maxAbs(emb, "embedding")
  lazy val codes = ScalarQuant.encode(emb, "vec_id", "embedding", scale)

  test("codes stay inside int8 range and reconstruction error is bounded") {
    val mm = codes.select(explode($"q8").as("c")).agg(min($"c"), max($"c"))
      .as[(Long, Long)].head()
    assert(mm._1 >= -128 && mm._2 <= 127, s"code range $mm")
    // |x - code*scale/127| <= scale/127 (floor grid, one cell wide) —
    // checked per element on a sample row against the same expression
    val step = scale / 127d
    val row = emb.select($"embedding").head().getSeq[Float](0)
    row.foreach { x =>
      val c = math.floor(x.toDouble * 127d / scale)
      assert(math.abs(x.toDouble - c * step) <= step + 1e-12)
    }
  }

  test("encode is a pure projection, invariant to partitioning") {
    val a = codes.orderBy($"id").collect().toSeq
    val b = ScalarQuant.encode(emb.repartition(7), "vec_id", "embedding", scale)
      .orderBy($"id").collect().toSeq
    assert(a == b)
  }

  test("sq8TopK matches the window formulation and finds each query itself first") {
    val q = codes.filter($"id" % 50 === 0)
    val got = ScalarQuant.sq8TopK(codes, q, 5)
      .orderBy($"qid", $"rn").collect().toSeq
    val qq = q.select($"id".as("qid"), $"q8".as("q_q8"), $"nsq8".as("q_nsq8"))
    val w = Window.partitionBy($"qid").orderBy($"d2", $"cid")
    val want = codes.crossJoin(qq)
      .select($"qid", $"id".as("cid"),
        ($"q_nsq8" + $"nsq8" - lit(2L) * dot_long($"q_q8", $"q8")).as("d2"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter($"rn" <= 5).select($"qid", $"cid", $"d2", $"rn")
      .orderBy($"qid", $"rn").collect().toSeq
    assert(got.nonEmpty && got == want)
    // a query against its own corpus row: d2 = 0 at rank 1
    got.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && r.getLong(2) == 0L, r.toString)
    }
  }

  test("compressed-domain top-5 closely tracks full-precision L2 order") {
    val q = codes.filter($"id" % 50 === 0)
    val sq = ScalarQuant.sq8TopK(codes, q, 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    // full-precision reference on the raw vectors (quantized 1e6 grid)
    val cv = emb.select($"vec_id".cast(LongType).as("cid"),
        quantize($"embedding").as("c_qv"))
      .withColumn("c_nsq", dot_long($"c_qv", $"c_qv"))
    val qv = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".cast(LongType).as("qid"), quantize($"embedding").as("q_qv"))
      .withColumn("q_nsq", dot_long($"q_qv", $"q_qv"))
    val w = Window.partitionBy($"qid").orderBy($"d2", $"cid")
    val exact = cv.crossJoin(qv)
      .select($"qid", $"cid",
        ($"q_nsq" + $"c_nsq" - lit(2L) * dot_long($"q_qv", $"c_qv")).as("d2"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = sq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, f"sq8 top-5 recall $recall%.2f vs full precision")
  }
}
