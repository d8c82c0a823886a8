package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{Profiling, SketchOps, TextOps}
import graft.plans.{HllRegistersAgg, PolyHash64}
import graft.sources.Tables

/** Round-9 additions (SURVEY.md §2 rows 138, 140-142): deterministic
  * HLL registers, keep-best canonical selection, cluster-aware split,
  * corpus version diff. */
class SketchCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 6
  private val M = 1 << P

  /** Scala reference of the register pipeline (independent of the
    * aggregate's buffer plumbing). */
  private def refRegisters(items: Seq[String]): Array[Int] = {
    val regs = new Array[Int](M)
    items.foreach { it =>
      val h = PolyHash64.compute(UTF8String.fromString("hll|" + it))
      val b = java.lang.Math.floorMod(h, M.toLong).toInt
      val w = h >>> P
      val rho = if (w == 0L) 64 - P + 1 else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > regs(b)) regs(b) = rho
    }
    regs
  }

  private def aggRegisters(items: Seq[String]): Array[Int] =
    items.toDF("item")
      .agg(HllRegistersAgg.hll_registers(col("item"), P).as("r"))
      .head().getSeq[Int](0).toArray

  test("hll registers match the scala reference pipeline") {
    val items = (1 to 500).map(i => s"user-$i")
    assert(aggRegisters(items).toSeq == refRegisters(items).toSeq)
  }

  test("hll merge is elementwise max: union == max(partials), idempotent") {
    val a = (1 to 300).map(i => s"u$i")
    val b = (200 to 600).map(i => s"u$i") // overlap on purpose
    val ra = aggRegisters(a)
    val rb = aggRegisters(b)
    val runion = aggRegisters(a ++ b)
    val merged = ra.zip(rb).map { case (x, y) => math.max(x, y) }
    assert(runion.toSeq == merged.toSeq)
    // idempotence: re-merging a batch already included changes nothing
    assert(runion.zip(ra).map { case (x, y) => math.max(x, y) }.toSeq == runion.toSeq)
  }

  test("hll registers coerce a non-string child at analysis time") {
    // before declaring inputTypes, a long child passed analysis and
    // died inside the aggregate with a ClassCastException; now the
    // implicit StringType cast makes it equal the explicit-cast form
    val df = (1L to 400L).toDF("uid")
    val implicitCast = df.agg(HllRegistersAgg.hll_registers(col("uid"), P).as("r"))
      .head().getSeq[Int](0)
    val explicitCast = df.agg(
        HllRegistersAgg.hll_registers(col("uid").cast("string"), P).as("r"))
      .head().getSeq[Int](0)
    assert(implicitCast == explicitCast)
  }

  test("hll estimate lands near the exact distinct count") {
    val ev = Tables.events(spark, TestSpark.sf)
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0).toDouble
    val est = ev.select(col("user_id").cast("string").as("item"))
      .agg(HllRegistersAgg.hll_registers(col("item"), P).as("r"))
      .select(HllRegistersAgg.estimate(col("r"), P).as("e"))
      .head().getDouble(0)
    // m=64 -> sigma ~ 1.04/8 = 13%; allow 3 sigma
    assert(math.abs(est - exact) / exact < 0.4, s"est=$est exact=$exact")
  }

  test("q_hll_registers: the ALL row is the max over the daily rows") {
    val out = SketchOps.hllRegistersQ(spark, TestSpark.sf).collect()
    val daily = out.filter(_.getString(0) != "ALL")
    val all = out.filter(_.getString(0) == "ALL")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(all.size == M)
    val expect = daily.groupBy(_.getLong(1))
      .map { case (b, rows) => b -> rows.map(_.getLong(2)).max }
    assert(expect == all)
  }

  test("hll aggregates a stream: complete-mode registers equal the batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val q = ms.toDS().toDF("item")
      .agg(HllRegistersAgg.hll_registers(col("item"), P).as("r"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("hll_stream").start()
    try {
      ms.addData("a", "b", "a")
      q.processAllAvailable()
      ms.addData("c", "a", "d")
      q.processAllAvailable()
      val streamed = spark.table("hll_stream").head().getSeq[Int](0)
      val batch = Seq("a", "b", "a", "c", "a", "d").toDF("item")
        .agg(HllRegistersAgg.hll_registers(col("item"), P).as("r"))
        .head().getSeq[Int](0)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("novelty: pure-copy docs score 0, the original scores 100") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),        // exact copy of 1
      (3L, "zeta eta theta iota kappa lambda"),      // all-novel
      (4L, "beta gamma delta zeta eta theta")        // recombination of 1+3
    ).toDF("doc_id", "text")
    val out = TextOps.noveltyScores(docs, "doc_id", "text")
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("novelty_pct"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 100L)
    assert(out(2L) == 0L)
    assert(out(3L) == 100L)
    // doc 4's shingles "beta gamma delta" and "zeta eta theta" are
    // seen; the two stitch shingles are new -> 2/4 = 50
    assert(out(4L) == 50L, out.toString)
  }

  test("novelty state: state-fed == direct, idempotent, order-free") {
    import graft.operators.NoveltyState
    val docs = Tables.documents(spark, TestSpark.sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_novspec").toString
    NoveltyState.commitNoveltyDelta(spark, corpus, "doc_id", "text", root, "corpus")
    NoveltyState.commitNoveltyDelta(spark, batch, "doc_id", "text", root, "b1")
    val fed = NoveltyState.scoreAgainstState(
        NoveltyState.stateFrom(spark, root), batch, "doc_id", "text")
      .orderBy(col("doc_id")).collect().toSeq
    val direct = TextOps.noveltyScores(docs, "doc_id", "text")
      .filter(pmod(col("doc_id"), lit(4)) === 0)
      .orderBy(col("doc_id")).collect().toSeq
    assert(fed == direct && fed.nonEmpty)
    // retry idempotence: re-landing a batch changes nothing
    NoveltyState.commitNoveltyDelta(spark, batch, "doc_id", "text", root, "b1")
    val fed2 = NoveltyState.scoreAgainstState(
        NoveltyState.stateFrom(spark, root), batch, "doc_id", "text")
      .orderBy(col("doc_id")).collect().toSeq
    assert(fed2 == fed)
    // arrival order is irrelevant: first-seen is keyed by doc id
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_novspec2").toString
    NoveltyState.commitNoveltyDelta(spark, batch, "doc_id", "text", root2, "b1")
    NoveltyState.commitNoveltyDelta(spark, corpus, "doc_id", "text", root2, "corpus")
    val fed3 = NoveltyState.scoreAgainstState(
        NoveltyState.stateFrom(spark, root2), batch, "doc_id", "text")
      .orderBy(col("doc_id")).collect().toSeq
    assert(fed3 == fed)
  }

  test("novelty is invariant to doc partitioning") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val a = TextOps.noveltyScores(docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect().toSeq
    val b = TextOps.noveltyScores(docs.repartition(11, col("text")), "doc_id", "text")
      .orderBy(col("doc_id")).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("keepBestPerCluster picks max quality, ties to smaller id") {
    val cc = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("id", "comp")
    val q = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (7L, 0.1), (8L, 0.1))
      .toDF("doc_id", "q")
    val out = TextOps.keepBestPerCluster(cc, q)
      .orderBy(col("comp")).as[(Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.9, 3L), (7L, 7L, 0.1, 2L)))
  }

  test("clusterSplit: every member of a component shares the split") {
    val docs = (1L to 200L).toDF("doc_id")
    val cc = Seq((10L, 10L), (11L, 10L), (57L, 10L), (80L, 80L), (81L, 80L))
      .toDF("id", "comp")
    val out = TextOps.clusterSplit(docs, "doc_id", cc)
    val perComp = out.groupBy(col("comp"))
      .agg(countDistinct(col("split")).as("k")).collect()
    assert(perComp.forall(_.getLong(1) == 1L))
    // singleton assignment degenerates to the id-level hash
    val single = out.filter(col("doc_id") === 5L).head()
    val expect = java.lang.Math.floorMod(
      PolyHash64.compute(UTF8String.fromString("csplit|5")), 100L)
    assert(single.getLong(2) == expect)
    // all three splits appear over 200 docs
    assert(out.select(col("split")).distinct().count() == 3L)
  }

  test("versionDiff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "x"), (4L, "d")).toDF("doc_id", "text")
    val out = Profiling.versionDiff(v1, v2, "doc_id", "text")
      .orderBy(col("doc_id")).as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
  }

  test("weightedMedian: weight-skewed vs uniform, lower-median rule") {
    import graft.operators.Profiling
    val df = Seq((1L, 1L), (2L, 1L), (3L, 10L)).toDF("v", "w")
      .withColumn("g", lit("a"))
    val m = Profiling.weightedMedian(df, col("g"), col("v"), col("w"))
      .as[(String, Long, Long)].head()
    assert(m == ("a", 3L, 12L)) // the heavy value owns the median
    val even = Seq((1L, 5L), (2L, 5L)).toDF("v", "w").withColumn("g", lit("b"))
    val m2 = Profiling.weightedMedian(even, col("g"), col("v"), col("w"))
      .as[(String, Long, Long)].head()
    assert(m2 == ("b", 1L, 10L)) // exact half -> LOWER median
  }

  test("fdAudit: majority, confidence, deterministic tie-break") {
    import graft.operators.Profiling
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "fr"),
      ("s2", "de"), ("s2", "en")).toDF("src", "lang")
    val got = Profiling.fdAudit(df, "src", "lang")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("s1", "en", 3L, 2L, 66L),   // floor(200/3)
      ("s2", "de", 2L, 1L, 50L)))  // tie 1-1 -> smaller dep value
  }

  test("winsorize: exact bounds, clamped mass on both sides") {
    import graft.operators.Profiling
    // 100 rows of v=1..100 in one group: p5 -> 5, p95 -> 95
    val df = (1L to 100L).map(v => ("a", v)).toDF("g", "v")
    val r = Profiling.winsorize(df, col("g"), col("v"), 5, 95)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    val (g, n, lo, hi, nLo, nHi, sw) = r
    assert((g, n, lo, hi) == ("a", 100L, 5L, 95L))
    assert(nLo == 4L && nHi == 5L) // v<5 -> 4 rows; v>95 -> 5 rows
    // clamped sum: 4*5 + sum(5..95) + 5*95
    assert(sw == 4L * 5 + (5L to 95L).sum + 5L * 95)
  }

  test("winsorize: duplicate-heavy values collapse before the cumsum") {
    import graft.operators.Profiling
    // 9 copies of 10 + one 1000: p95 bound must be 1000 only if the
    // tail row covers the 95th percentile -- cum at v=10 is 90 < 95
    val df = (Seq.fill(9)(10L) :+ 1000L).map(("a", _)).toDF("g", "v")
    val r = Profiling.winsorize(df, col("g"), col("v"), 5, 95)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(r._3 == 10L && r._4 == 1000L && r._5 == 0L && r._6 == 0L)
  }

  test("trendPerGroup recovers an exact line") {
    import graft.operators.Profiling
    val df = (1L to 5L).map(x => ("g", x, 2.0 * x + 3.0)).toDF("g", "x", "y")
    val t = Profiling.trendPerGroup(df, col("g"), col("x"), col("y"))
      .as[(String, Long, Double, Double)].head()
    assert(t == ("g", 5L, 2.0, 3.0), t.toString)
  }

  test("rankAgreement: identity, reversal, zero overlap") {
    import graft.operators.Fusion
    val ra = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 10L, 1L), (2L, 20L, 2L), (2L, 30L, 3L),
      (3L, 77L, 1L)).toDF("qid", "doc_id", "rn")
    val rb = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L), // identical
      (2L, 10L, 3L), (2L, 20L, 2L), (2L, 30L, 1L),            // reversed
      (3L, 88L, 1L)).toDF("qid", "doc_id", "rn")               // no overlap
    val out = Fusion.rankAgreement(ra, rb).orderBy(col("qid"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 3L, 0L), (2L, 3L, 0L, 3L), (3L, 0L, 0L, 0L)))
  }

  test("versionDiff: NULL text is content, not absence") {
    val v1 = Seq((1L, null), (2L, null), (3L, "c"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, null), (2L, "b"), (4L, null))
      .toDF("doc_id", "text")
    val out = Profiling.versionDiff(v1, v2, "doc_id", "text")
      .orderBy(col("doc_id")).as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
  }

  test("versionDiff of a snapshot against itself is all-unchanged") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val out = Profiling.versionDiff(docs, docs, "doc_id", "text")
    assert(out.filter(col("status") =!= "unchanged").count() == 0L)
    assert(out.count() == docs.count())
  }
}
