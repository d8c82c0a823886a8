package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hygiene
import graft.plans.UnicodeNorm

/** Corpus hygiene (§2 rows 158–160): unicode normalization
  * expressions, C4-style global line dedup, skyline selection. */
class HygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- UnicodeNorm expression ----

  test("nfc composes, nfkc folds compatibility, strip_accents recomposes") {
    val df = Seq("e\u0301", "\ufb01x", "nai\u0308ve", "\ud55c").toDF("t")
    val out = df.select(
      UnicodeNorm.nfc_normalize(col("t")).as("nfc"),
      UnicodeNorm.nfkc_normalize(col("t")).as("nfkc"),
      UnicodeNorm.strip_accents(col("t")).as("strip")).collect()
    assert(out(0).getString(0) == "\u00e9")      // e+acute composes
    assert(out(0).getString(2) == "e")          // stripped
    assert(out(1).getString(1) == "fix")        // ﬁ ligature folds under NFKC
    assert(out(1).getString(0) == "\ufb01x")     // ...but not under NFC
    assert(out(2).getString(2) == "naive")      // ı + diaeresis: mark dropped
    // strip_accents RECOMPOSES after stripping (DuckDB/utf8proc parity,
    // probed via Hangul jamo -> composed syllable)
    assert(out(3).getString(2) == "\ud55c")
  }

  test("ascii fast path returns the identical UTF8String instance") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("plain ascii text")
    assert(UnicodeNorm.compute(s, "nfc") eq s)
    assert(UnicodeNorm.compute(s, "strip_accents") eq s)
  }

  test("interpreted and codegen paths agree") {
    val df = Seq("e\u0301 mixed i\u0308", "pure ascii").toDF("t")
    val viaExpr = df.select(UnicodeNorm.nfc_normalize(col("t"))).collect().map(_.getString(0))
    // filter forces a different (wholestage-codegen) plan shape
    val viaCodegen = df.filter(length(col("t")) > 0)
      .select(UnicodeNorm.nfc_normalize(col("t"))).collect().map(_.getString(0))
    assert(viaExpr.toSeq == viaCodegen.toSeq)
  }

  test("null input stays null; bad mode rejected") {
    val df = Seq[Option[String]](None, Some("x")).toDF("t")
    val out = df.select(UnicodeNorm.nfc_normalize(col("t"))).collect()
    assert(out(0).isNullAt(0) && out(1).getString(0) == "x")
    intercept[IllegalArgumentException] {
      graft.plans.UnicodeNorm(null, "nfz")
    }
  }

  // ---- dedupLines ----

  test("line dedup keeps first global occurrence and reassembles in order") {
    val docs = Seq(
      (1L, "alpha\nbeta\ngamma"),
      (2L, "beta\ndelta"),       // beta lost to doc 1
      (3L, "alpha\nbeta"),       // fully deduped
      (4L, "gamma\ngamma"))      // both copies lose to doc 1's gamma
      .toDF("doc_id", "text")
    val out = Hygiene.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 3L, "alpha\nbeta\ngamma"),
      (2L, 2L, 1L, "delta"),
      (3L, 2L, 0L, ""),
      (4L, 2L, 0L, "")))
  }

  test("within one doc the earlier position wins") {
    val docs = Seq((7L, "x\ny\nx\nz")).toDF("doc_id", "text")
    val out = Hygiene.dedupLines(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].head()
    assert(out == ((7L, 4L, 3L, "x\ny\nz")))
  }

  // ---- skyline2 ----

  test("skyline keeps the frontier, drops dominated, keeps exact ties") {
    val df = Seq(
      (1L, 10L, 5L),  // frontier
      (2L, 10L, 5L),  // exact tie of 1 -> kept (mutual non-domination)
      (3L, 10L, 4L),  // dominated by 1 (same m1, lower m2)
      (4L, 8L, 7L),   // frontier (higher m2 than everything longer)
      (5L, 8L, 6L),   // dominated by 4
      (6L, 12L, 3L),  // frontier (longest)
      (7L, 7L, 7L))   // dominated by 4 (m1 lower, m2 equal)
      .toDF("id", "a", "b")
    val out = Hygiene.skyline2(df, col("a"), col("b"), Seq("id"))
      .select(col("id")).as[Long].collect().toSet
    assert(out == Set(1L, 2L, 4L, 6L))
  }
}
