package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.PqIndex
import graft.plans.VectorKernels.dot_long
import graft.sources.Tables

/** Product-quantization ANN (§2 rows 106–107): codebook shape,
  * encode determinism, ADC parity with the window formulation, clone
  * retrieval, and the IVF-PQ ⊇ exhaustive-ADC identity at full probe. */
class PqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 64; private val M = 4; private val Kc = 8
  lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  lazy val cb = PqIndex.hashCodebook(emb, "vec_id", "embedding", Dim, M, Kc)
  lazy val codes = PqIndex.encode(emb, "vec_id", "embedding", cb, Dim, M)

  test("hash codebook is (m x kc) with dense codes per subspace") {
    val rows = cb.select($"sub", $"code").as[(Int, Int)].collect()
    assert(rows.length == M * Kc)
    (0 until M).foreach { s =>
      assert(rows.filter(_._1 == s).map(_._2).sorted.toSeq == (0 until Kc))
    }
    val dims = cb.select(size($"c_q")).as[Int].collect()
    assert(dims.forall(_ == Dim / M), "centroid subvector width")
  }

  test("encode is invariant to input partitioning and emits m codes per vector") {
    val a = codes.orderBy($"id", $"sub").collect().toSeq
    val b = PqIndex.encode(emb.repartition(7), "vec_id", "embedding", cb, Dim, M)
      .orderBy($"id", $"sub").collect().toSeq
    assert(a == b)
    val perId = codes.groupBy($"id").count().select($"count").as[Long].collect()
    assert(perId.forall(_ == M))
  }

  test("packCodes emits one sub-ordered code array per vector") {
    val packed = PqIndex.packCodes(codes)
    val long = codes.withColumn("codes", col("code"))
    val fromLong = long.orderBy($"id", $"sub").select($"id", $"code")
      .as[(Long, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val got = packed.select($"id", $"codes").as[(Long, Seq[Int])].collect().toMap
    assert(got == fromLong)
  }

  /** Window-form reference: sum the LUT distances per (query,
    * candidate), rank with ROW_NUMBER — the shape the oracle replays
    * and the aggregator must match bit-for-bit. */
  private def windowReference(queries: org.apache.spark.sql.DataFrame, k: Int) = {
    val sub = Dim / M
    val qsubs = queries.select($"vec_id".cast(LongType).as("qid"),
        quantize($"embedding").as("qv"))
      .select($"qid", explode(array((0 until M).map(s =>
        struct(lit(s).as("sub"), slice($"qv", s * sub + 1, sub).as("qsub"))): _*)).as("se"))
      .select($"qid", $"se.sub".as("sub"), $"se.qsub".as("qsub"))
    val lut = qsubs.join(cb, "sub")
      .select($"qid", $"sub", $"code",
        (dot_long($"qsub", $"qsub") + $"c_nsq"
          - lit(2L) * dot_long($"qsub", $"c_q")).as("d2"))
    val summed = codes.join(lut, Seq("sub", "code"))
      .groupBy($"qid", $"id".as("cid")).agg(sum($"d2").as("adc_d2"))
    val w = Window.partitionBy($"qid").orderBy($"adc_d2", $"cid")
    summed.withColumn("rn", row_number().over(w).cast(LongType))
      .filter($"rn" <= k)
      .select($"qid", $"cid", $"adc_d2", $"rn")
  }

  test("adcTopK (k-bounded aggregator) matches the window formulation") {
    val q = emb.filter($"vec_id" % 50 === 0)
    val got = PqIndex.adcTopK(codes, q, "vec_id", "embedding", cb, Dim, M, 5)
      .orderBy($"qid", $"rn").collect().toSeq
    val want = windowReference(q, 5).orderBy($"qid", $"rn").collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("an exact clone shares codes and is retrieved next to its original") {
    val clone = emb.filter($"vec_id" === 0)
      .withColumn("vec_id", lit(9001L))
    val corpus = emb.unionByName(clone)
    val cb2 = PqIndex.hashCodebook(emb, "vec_id", "embedding", Dim, M, Kc)
    val codes2 = PqIndex.encode(corpus, "vec_id", "embedding", cb2, Dim, M)
    val c0 = codes2.filter($"id" === 0L).orderBy($"sub").select($"code").as[Int].collect().toSeq
    val c1 = codes2.filter($"id" === 9001L).orderBy($"sub").select($"code").as[Int].collect().toSeq
    assert(c0 == c1, "identical vectors must encode identically")
    val top = PqIndex.adcTopK(codes2, emb.filter($"vec_id" === 0), "vec_id",
        "embedding", cb2, Dim, M, 5)
      .select($"cid", $"adc_d2").as[(Long, Long)].collect().toMap
    assert(top.contains(0L) && top.contains(9001L), s"clone missing from top-5: $top")
    assert(top(0L) == top(9001L), "clone must tie the original's ADC distance")
  }

  test("ivfPqTopK at full probe equals the exhaustive ADC scan") {
    val q = emb.filter($"vec_id" % 50 === 0)
    val full = PqIndex.ivfPqTopK(emb, q, "vec_id", "embedding",
        Dim, M, Kc, kClusters = 8, nprobe = 8, k = 5)
      .orderBy($"qid", $"rn").collect().toSeq
    val exhaustive = PqIndex.adcTopK(codes, q, "vec_id", "embedding", cb, Dim, M, 5)
      .orderBy($"qid", $"rn").collect().toSeq
    assert(full == exhaustive)
  }

  test("ivfPqTopK candidates stay inside the probed cells") {
    import graft.operators.SemDedup
    val q = emb.filter($"vec_id" % 50 === 0)
    val seeds = SemDedup.hashSeeds(emb, "vec_id", "embedding", 8)
    val assigned = SemDedup.assignClusters(emb, "vec_id", "embedding", seeds)
      .select($"id".cast(LongType).as("cid"), $"cluster")
    val got = PqIndex.ivfPqTopK(emb, q, "vec_id", "embedding",
      Dim, M, Kc, kClusters = 8, nprobe = 2, k = 5)
    // recompute each query's probed cells the operator's way
    val qv = q.select($"vec_id".cast(LongType).as("qid"),
        quantize($"embedding").as("q_qv"))
      .withColumn("q_nsq", dot_long($"q_qv", $"q_qv"))
    val wp = Window.partitionBy($"qid").orderBy($"__d2", $"sid")
    val probed = qv.crossJoin(seeds)
      .withColumn("__d2", $"q_nsq" + $"s_nsq" - lit(2L) * dot_long($"q_qv", $"s_qv"))
      .withColumn("__rn", row_number().over(wp)).filter($"__rn" <= 2)
      .select($"qid", $"sid".as("cluster"))
    val escaped = got.join(assigned, "cid")
      .join(probed.withColumnRenamed("cluster", "ok_cluster"), Seq("qid"))
      .groupBy($"qid", $"cid", $"cluster")
      .agg(max(when($"cluster" === $"ok_cluster", 1).otherwise(0)).as("inside"))
      .filter($"inside" === 0)
    assert(escaped.count() == 0, "a returned candidate sits in an unprobed cell")
  }

  test("rerank with a full-corpus shortlist equals exact brute-force L2 top-k") {
    val q = emb.filter($"vec_id" % 50 === 0)
    val n = emb.count().toInt
    val got = PqIndex.adcRerankTopK(codes, emb, q, "vec_id", "embedding",
        cb, Dim, M, shortlist = n, k = 5)
      .orderBy($"qid", $"rn").collect().toSeq
    // exact reference: quantized L2 of every (query, candidate) pair
    val cv = emb.select($"vec_id".cast(LongType).as("cid"),
        quantize($"embedding").as("c_qv"))
      .withColumn("c_nsq", dot_long($"c_qv", $"c_qv"))
    val qv = q.select($"vec_id".cast(LongType).as("qid"),
        quantize($"embedding").as("q_qv"))
      .withColumn("q_nsq", dot_long($"q_qv", $"q_qv"))
    val w = Window.partitionBy($"qid").orderBy($"d2", $"cid")
    val want = cv.crossJoin(qv)
      .select($"qid", $"cid",
        ($"q_nsq" + $"c_nsq" - lit(2L) * dot_long($"q_qv", $"c_qv")).as("d2"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter($"rn" <= 5)
      .select($"qid", $"cid", $"d2", $"rn")
      .orderBy($"qid", $"rn").collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("rerank results never leave the ADC shortlist") {
    val q = emb.filter($"vec_id" % 50 === 0)
    val short = PqIndex.adcTopK(codes, q, "vec_id", "embedding", cb, Dim, M, 20)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val got = PqIndex.adcRerankTopK(codes, emb, q, "vec_id", "embedding",
        cb, Dim, M, shortlist = 20, k = 5)
      .select($"qid", $"cid").as[(Long, Long)].collect()
    assert(got.nonEmpty && got.forall(short.contains))
  }

  test("codebook and codes fed back from parquet reproduce the search exactly") {
    val dir = java.nio.file.Files.createTempDirectory("pqstate").toString
    cb.write.mode("overwrite").parquet(s"$dir/codebook")
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    val cb2 = spark.read.parquet(s"$dir/codebook")
    val codes2 = spark.read.parquet(s"$dir/codes")
    val q = emb.filter($"vec_id" % 50 === 0)
    val direct = PqIndex.adcTopK(codes, q, "vec_id", "embedding", cb, Dim, M, 5)
      .orderBy($"qid", $"rn").collect().toSeq
    val fed = PqIndex.adcTopK(codes2, q, "vec_id", "embedding", cb2, Dim, M, 5)
      .orderBy($"qid", $"rn").collect().toSeq
    assert(fed == direct)
    // a new batch encodes against the persisted codebook without
    // touching the corpus — the signature-table ingest posture
    val batch = emb.filter($"vec_id" % 97 === 0)
    val be = PqIndex.encode(batch, "vec_id", "embedding", cb2, Dim, M)
    val all = PqIndex.encode(emb, "vec_id", "embedding", cb, Dim, M)
      .join(batch.select($"vec_id".cast(LongType).as("id")), "id")
    assert(be.orderBy($"id", $"sub").collect().toSeq ==
      all.orderBy($"id", $"sub").collect().toSeq)
  }

  test("kmeans codebook has the same shape and encodes deterministically") {
    val km = PqIndex.kmeansCodebook(emb, "vec_id", "embedding", Dim, M, Kc)
    assert(km.count() == M * Kc)
    val e1 = PqIndex.encode(emb, "vec_id", "embedding", km, Dim, M)
      .orderBy($"id", $"sub").collect().toSeq
    val e2 = PqIndex.encode(emb, "vec_id", "embedding",
        PqIndex.kmeansCodebook(emb, "vec_id", "embedding", Dim, M, Kc), Dim, M)
      .orderBy($"id", $"sub").collect().toSeq
    assert(e1 == e2)
  }
}
