package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fuzzy
import graft.plans.JaroWinkler

/** Jaro-Winkler expression + entity resolution (§2 rows 161/162). */
class EntityResSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches the published reference values bit-for-bit") {
    // values cross-checked against DuckDB jaro_winkler_similarity
    // (5000-pair fuzz at build time, zero mismatches)
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
    assert(jw("PROMO", "PROMOTION") == 0.9111111111111111)
  }

  test("edge cases: empty-before-equal gate, no-match zero, symmetry") {
    assert(jw("", "") == 0.0)   // DuckDB: length gate precedes equality
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("forest green", "green forest") == jw("green forest", "forest green"))
  }

  test("expression: codegen and interpreted paths agree, null-safe") {
    val df = Seq(("martha", "marhta"), ("abc", "abc"), (null, "x"))
      .toDF("a", "b")
    val out = df.select(JaroWinkler.jaro_winkler(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 0.9611111111111111)
    assert(out(1).getDouble(0) == 1.0)
    assert(out(2).isNullAt(0))
  }

  test("entityResolve clusters typo variants and keeps singletons") {
    val m = Seq(
      (10L, "red widget"), (11L, "red widge"),   // typo of the same entity
      (12L, "red widget"),                       // exact repeat
      (20L, "blue bolt"),                        // singleton
      (30L, "green gear"), (31L, "Green gear"))  // case variant, shares prefix 'gre'
      .toDF("id", "nm")
    val out = Fuzzy.entityResolve(m, 0.9)
      .orderBy("id").as[(Long, Long, String)].collect().toSeq
    // entity = min mention id of the component; canonical = its name
    assert(out == Seq(
      (10L, 10L, "red widget"), (11L, 10L, "red widget"),
      (12L, 10L, "red widget"),
      (20L, 20L, "blue bolt"),
      (30L, 30L, "green gear"), (31L, 30L, "green gear")))
  }

  test("phonetic keys: classic pairs collide, distinct sounds don't") {
    def key(ws: String*): Seq[Option[String]] =
      ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("i", "w")
        .select(Fuzzy.phoneticKey(col("w")).as("k"))
        .as[Option[String]].collect().toSeq
    // the classic Soundex anchor pair
    assert(key("Robert", "Rupert") == Seq(Some("R163"), Some("R163")))
    // vowel swaps and doubled letters are key-invariant by design
    assert(key("lavender", "lavandar", "llavender").distinct.size == 1)
    // different leading sound -> different key; short words pad with 0
    assert(key("smith", "zmith").distinct.size == 2)
    assert(key("lee") == Seq(Some("L000")))
    // letterless input -> NULL
    assert(key("123", "") == Seq(None, None))
    // punctuation is stripped before coding
    assert(key("o'brien") == key("obrien"))
  }

  test("pairs are scored on the distinct-name frame only") {
    // 4 mentions, 2 distinct names, same block -> exactly one scored pair
    val m = Seq((1L, "alpha beta"), (2L, "alpha beta"),
      (3L, "alpha betb"), (4L, "alpha betb")).toDF("id", "nm")
    val pairs = Fuzzy.jaroPairs(m, 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 3L)
  }
}
