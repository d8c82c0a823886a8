package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeOps
import graft.plans.BpeMergePair
import graft.plans.BpeMergePair.bpe_merge_pair

/** BPE trainer/encoder (SURVEY.md §2 row 116): greedy-scan kernel
  * semantics (incl. the overlap case), kernel parity between the
  * column path and direct evaluation, hand-verified merge learning,
  * lossless piece reassembly, and determinism under repartitioning. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mergeRef(syms: Seq[String], a: String, b: String): Seq[String] = {
    // straight-line reference of the greedy scan
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  test("merge kernel: greedy scan incl. overlapping runs") {
    val cases = Seq(
      (Seq("a", "b", "c"), "a", "b", Seq("ab", "c")),
      (Seq("a", "a", "a"), "a", "a", Seq("aa", "a")),
      (Seq("a", "a", "a", "a"), "a", "a", Seq("aa", "aa")),
      (Seq("b", "a", "b"), "a", "b", Seq("b", "ab")),
      (Seq("x"), "a", "b", Seq("x")),
      (Seq.empty[String], "a", "b", Seq.empty[String]))
    for ((in, a, b, want) <- cases) {
      val arr = new GenericArrayData(in.map(UTF8String.fromString).toArray[Any])
      val got = BpeMergePair.compute(arr, UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got.numElements() == want.length, s"$in")
      val gotSeq = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
      assert(gotSeq == want, s"$in -> $gotSeq, want $want")
      assert(gotSeq == mergeRef(in, a, b))
    }
  }

  test("column path (codegen) agrees with the direct kernel") {
    val data = Seq(
      Seq("l", "o", "w", "e", "r"),
      Seq("a", "a", "a"),
      Seq("n", "e", "w", "e", "s", "t"))
    val got = data.toDF("syms")
      .select(bpe_merge_pair($"syms", "e", "s").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got == data.map(mergeRef(_, "e", "s")))
  }

  test("learnMerges reproduces the classic hand-traced example") {
    // 5x "abab", 2x "abc": pair counts round 1: (a,b)=5*2+2=12, (b,a)=5, (b,c)=2
    val docs = ((1 to 5).map(i => (i.toLong, "abab")) ++
      Seq((6L, "abc"), (7L, "abc"))).toDF("doc_id", "text")
    val merges = BpeOps.learnMerges(docs, "text", 3)
    // round 1 merges (a,b) -> words become [ab, ab] x5, [ab, c] x2
    // round 2: (ab,ab)=5 vs (ab,c)=2 -> merge (ab, ab)
    // round 3: only (ab, c)=2 remains
    assert(merges == Seq(("a", "b"), ("ab", "ab"), ("ab", "c")), merges.toString)
  }

  test("merges run dry on a single-char-word corpus") {
    val docs = Seq((1L, "a b c"), (2L, "b c a")).toDF("doc_id", "text")
    assert(BpeOps.learnMerges(docs, "text", 4).isEmpty)
  }

  test("encoding is lossless: pieces concatenate back to the words") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf).limit(50)
    val merges = BpeOps.learnMerges(docs, "text", 6)
    assert(merges.nonEmpty)
    val bad = BpeOps.encode(docs, "doc_id", "text", merges)
      .select($"doc_id", concat_ws("", $"pieces").as("joined"))
      .join(docs.select($"doc_id",
        regexp_replace(lower(regexp_replace(trim($"text"), "\\s+", " ")), " ", "")
          .as("squashed")), Seq("doc_id"))
      .filter($"joined" =!= $"squashed")
    assert(bad.count() == 0)
  }

  test("learned merges are invariant to input partitioning") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf).limit(80)
    val a = BpeOps.learnMerges(docs, "text", 4)
    val b = BpeOps.learnMerges(docs.repartition(11, $"lang"), "text", 4)
    assert(a == b && a.size == 4)
  }
}
