package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** k-anonymity audit + suppression (§2 row 155). */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, zip, age) with one 3-row class, one 2-row class, one singleton
  private def frame() = Seq(
    (1L, "94110", 30L), (2L, "94110", 30L), (3L, "94110", 30L),
    (4L, "94110", 40L), (5L, "94110", 40L),
    (6L, "10001", 99L),
  ).toDF("id", "zip", "age")

  test("audit sizes every equivalence class and flags below-k") {
    val got = Privacy.audit(frame(), Seq("zip", "age"), 3)
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("94110", 30L, 3L, false),
      ("94110", 40L, 2L, true),
      ("10001", 99L, 1L, true)))
  }

  test("suppression nulls quasi columns of at-risk rows only") {
    val got = Privacy.suppress(frame(), Seq("zip", "age"), 3)
      .as[(Long, Option[String], Option[Long])].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some("94110"), Some(30L)), (2L, Some("94110"), Some(30L)),
      (3L, Some("94110"), Some(30L)),
      (4L, None, None), (5L, None, None), (6L, None, None)))
  }

  test("suppressed release is k-anonymous over non-null classes") {
    val rel = Privacy.suppress(frame(), Seq("zip", "age"), 3)
    val classes = rel.filter(col("zip").isNotNull)
      .groupBy("zip", "age").count().as[(String, Long, Long)].collect()
    assert(classes.forall(_._3 >= 3))
    assert(rel.count() == 6) // suppression never drops rows
  }

  test("NULL quasi values form their own class") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "x")).toDF("id", "zip")
    val got = Privacy.audit(df, Seq("zip"), 2)
      .as[(Option[String], Long, Boolean)].collect().toSet
    assert(got == Set((None, 2L, false), (Some("x"), 1L, true)))
  }

  test("l-diversity flags the homogeneous k-anonymous class") {
    // class (94110, x3) is k-anonymous but all share disease "flu"
    val df = Seq(
      (1L, "94110", "flu"), (2L, "94110", "flu"), (3L, "94110", "flu"),
      (4L, "10001", "flu"), (5L, "10001", "cold"), (6L, "10001", "hiv"),
    ).toDF("id", "zip", "disease")
    val got = Privacy.auditLDiversity(df, Seq("zip"), "disease", 3, 2)
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("94110", 3L, 1L, true),   // size ok, diversity fails
      ("10001", 3L, 3L, false)))
  }

  test("tag + audit + suppress ride one exchange") {
    val plan = Privacy.suppress(frame(), Seq("zip", "age"), 3)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("generalizeToK picks the minimal qualifying level") {
    // widths 10,20,40...: at w=10 buckets {0,1,2} sizes (2,2,2) < 3;
    // at w=20 buckets {0,1} sizes (4,2) < 3; at w=40 bucket 0 size 6
    val df = Seq(5L, 7L, 12L, 15L, 25L, 27L).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "grp", "v")
    val (lvl, rel) = Privacy.generalizeToK(df, Seq("grp"), "v", 10L, 4, 3)
    assert(lvl == 2)
    assert(rel.select("v").as[Long].collect().toSet == Set(0L))
  }

  test("generalizeToK falls back to suppression past the top level") {
    // one immovable singleton group: no width unifies grp a with b
    val df = Seq((1L, "a", 5L), (2L, "b", 5L), (3L, "b", 6L), (4L, "b", 7L))
      .toDF("id", "grp", "v")
    val (lvl, rel) = Privacy.generalizeToK(df, Seq("grp"), "v", 10L, 3, 3)
    assert(lvl == 2)
    val rows = rel.as[(Long, Option[String], Option[Long])].collect()
      .sortBy(_._1).toSeq
    assert(rows.head == ((1L, None, None)))      // the singleton suppressed
    assert(rows.tail.forall(_._2.contains("b"))) // the k-class released
  }

  test("t-closeness: exact TVD fraction incl. absent-value fold") {
    // class a = {x,x,x}, class b = {x,y,y}; global x:4 y:2, N=6
    // TVD(a) = 1/2(|1-4/6| + |0-2/6|) = 1/3 -> num 12 / den 36
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"),
      ("b", "x"), ("b", "y"), ("b", "y")).toDF("grp", "v")
    val got = Privacy.auditTCloseness(df, Seq("grp"), "v", 1, 4)
      .as[(String, Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set(("a", 3L, 12L, 36L, true), ("b", 3L, 12L, 36L, true)))
    val loose = Privacy.auditTCloseness(df, Seq("grp"), "v", 1, 2)
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(loose.forall(!_._5)) // 1/3 <= 1/2
  }

  test("t-closeness: a class matching the global distribution scores 0") {
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("grp", "v")
    val got = Privacy.auditTCloseness(df, Seq("grp"), "v", 1, 10)
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(got.forall(r => r._3 == 0L && !r._5))
  }

  test("registered queries: audit classes cover all suppress rows") {
    val audit = Privacy.kanonAuditQ(spark, TestSpark.sf)
    val sup = Privacy.kanonSuppressQ(spark, TestSpark.sf)
    val atRiskMass = audit.filter(col("at_risk"))
      .agg(sum(col("class_n"))).as[Long].head()
    val nulled = sup.filter(col("lang").isNull).count()
    assert(audit.count() > 0 && nulled == atRiskMass)
  }

  test("dp release: reproducible per salt, fresh draws per epoch, bounded noise") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (s"g${i % 400}", i)).toDF("g", "id")
    val r1 = Privacy.dpCountRelease(df, Seq("g"), "epoch1")
      .as[(String, Long)].collect().toMap
    val r2 = Privacy.dpCountRelease(df, Seq("g"), "epoch1")
      .as[(String, Long)].collect().toMap
    assert(r1 == r2, "same salt must reproduce exactly")
    val r3 = Privacy.dpCountRelease(df, Seq("g"), "epoch2")
      .as[(String, Long)].collect().toMap
    assert(r1 != r3, "a new epoch salt must redraw the noise")
    // every group has true count 12 or 13; discrete-Laplace tails die
    // as 2^-|z| so |noise| >= 40 has probability ~2^-40 per group
    val noises = r1.map { case (g, rel) =>
      val r = g.stripPrefix("g").toInt
      rel - (if (r >= 1 && r <= 200) 13L else 12L) }
    assert(noises.forall(n => math.abs(n) <= 40), noises.toString)
    // P(Z = 0) = 1/3: with 400 draws expect ~133, allow a wide band
    val zeros = noises.count(_ == 0L)
    assert(zeros > 60 && zeros < 220, s"zeros=$zeros")
    // symmetry: the mean noise is near 0 (sd of the mean ~ 0.1)
    val mean = noises.sum.toDouble / noises.size
    assert(math.abs(mean) < 0.8, s"mean=$mean")
  }
}
