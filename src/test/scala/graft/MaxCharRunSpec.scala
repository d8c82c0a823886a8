package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MaxCharRun
import org.apache.spark.unsafe.types.UTF8String

/** MaxCharRun expression (SURVEY.md §2 row 213): kernel cases incl.
  * multibyte runs, interpreted-vs-codegen parity, whole-stage-codegen
  * presence, and NULL propagation. */
class MaxCharRunSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(s: String): Long =
    MaxCharRun.compute(UTF8String.fromString(s))

  test("kernel: ASCII, runs at ends, single char, empty") {
    assert(run("") == 0L)
    assert(run("a") == 1L)
    assert(run("abc") == 1L)
    assert(run("aabccc") == 3L)
    assert(run("cccab") == 3L)
    assert(run("abccc") == 3L)
    assert(run("aaaaaaaa") == 8L)
  }

  test("kernel: runs count code points, not bytes") {
    // Cyrillic 'а' is 2 bytes; 3 of them = run 3 (6 bytes)
    assert(run("xаааy") == 3L)
    // alternating multibyte chars never run
    assert(run("абаб") == 1L)
    // an astral emoji run (4-byte code points)
    assert(run("ab😀😀😀") == 3L)
    // same lead byte, different continuation — not a run
    assert(run("аб") == 1L)
  }

  test("column expression matches the kernel and survives codegen") {
    val df = Seq("aabccc", "", "zzzz", "xааy").toDF("s")
    val got = df.select(MaxCharRun.max_char_run($"s").as("r"))
      .as[Long].collect().toSeq
    assert(got == Seq(3L, 0L, 4L, 2L))
    // a LocalTableScan collapses to constants — check codegen on a
    // real scan instead
    val real = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(MaxCharRun.max_char_run(col("text")))
    // the '*(n)' prefix is the whole-stage-codegen marker in the
    // executed plan's simple string form
    val plan = real.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_max_char_run"), plan)
    real.collect() // and it executes through the generated code
  }

  test("NULL input propagates NULL") {
    val df = Seq(Some("aa"), None).toDF("s")
    val got = df.select(MaxCharRun.max_char_run($"s").as("r"))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(2L), None))
  }
}
