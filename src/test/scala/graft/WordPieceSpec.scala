package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.WordPieceEncode.word_piece

/** WordPiece greedy MaxMatch encoding (SURVEY.md §2 row 297): longest-
  * match-first, continuation `##` pieces, the whole-word UNK rule,
  * code-point granularity, the piece-length cap, and equality with a
  * direct Scala reference over generated words. */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Seq("un", "##aff", "##able", "##ab", "##le", "a", "b",
    "##a", "##b", "ta", "##ble", "tab", "日", "##本", "x", "##x")

  private def enc(w: String, v: Seq[String] = vocab, max: Int = 8) =
    Seq(Tuple1(w)).toDF("w")
      .select(word_piece(col("w"), v, maxPieceChars = max).as("p"))
      .as[Seq[String]].collect().head

  test("greedy takes the LONGEST match first, not the first vocab hit") {
    // 'tab' (3) beats 'ta' (2) at the start; '##le' covers the rest
    assert(enc("table") == Seq("tab", "##le"))
    assert(enc("unaffable") == Seq("un", "##aff", "##able"))
  }

  test("continuation positions match only ## pieces") {
    // 'aba': 'a' start, then ##b and ##a continuation forms
    assert(enc("aba") == Seq("a", "##b", "##a"))
    // 'ata': 'ta' exists only as a START piece, so after 'a' there is
    // no ##-form match -> whole-word UNK
    assert(enc("ata") == Seq("[UNK]"))
  }

  test("any gap collapses the WHOLE word to [UNK], even after matches") {
    assert(enc("az") == Seq("[UNK]")) // 'a' matched, 'z' has no ## form
    assert(enc("za") == Seq("[UNK]")) // no start match at all
  }

  test("empty input encodes to an empty array; multibyte counts code points") {
    assert(enc("") == Seq.empty)
    assert(enc("日本") == Seq("日", "##本"))
  }

  test("the piece-length cap bounds the probe (content chars, not ## bytes)") {
    assert(enc("unaffable", max = 3) == Seq("un", "##aff", "##ab", "##le"))
  }

  test("matches a direct Scala reference over generated words") {
    def ref(w: String): Seq[String] = {
      val vs = vocab.toSet
      val cps = w.codePoints().toArray
      var pos = 0
      val out = Seq.newBuilder[String]
      while (pos < cps.length) {
        var len = math.min(8, cps.length - pos)
        var m: String = null
        while (m == null && len >= 1) {
          val cand = (if (pos > 0) "##" else "") + new String(cps, pos, len)
          if (vs.contains(cand)) m = cand else len -= 1
        }
        if (m == null) return Seq("[UNK]")
        out += m
        pos += len
      }
      out.result()
    }
    val words = (1 to 300).map { i =>
      val parts = Seq("ta", "ble", "a", "b", "x", "z")
      (0 to i % 5).map(j => parts((i * 7 + j * 13) % parts.size)).mkString
    }.distinct
    val got = words.map(Tuple1(_)).toDF("w")
      .select(col("w"), word_piece(col("w"), vocab).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(got(w) == ref(w), s"mismatch for '$w'")
    }
  }
}
