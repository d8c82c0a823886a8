package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece-style greedy longest-match (MaxMatch) sub-word encoding
  * (SURVEY.md §2 row 297) — the BERT tokenizer family, completing the
  * trio next to BPE (row 116, merge-order-driven) and unigram Viterbi
  * (row 245, likelihood-driven): at each position take the LONGEST
  * vocabulary piece that matches (continuation positions match
  * `##`-prefixed pieces); if no piece matches anywhere in the word,
  * the WHOLE word becomes the unk token (the BERT rule — a word is
  * either fully segmentable or unknown, never half-encoded).
  *
  * A §4-(b) native Expression: greedy MaxMatch is a data-dependent
  * while-loop over positions with an inner longest-first probe — not
  * expressible as built-in Columns without either a per-word
  * O(len·maxLen) unrolled when-tree or an interpreted higher-order
  * fold; here it is one hash-set probe per candidate inside codegen.
  * The vocabulary rides as a PLAN LITERAL (the IVF-centroid /
  * suffix-probe posture: a tokenizer vocab is a bounded model, not
  * data) and is shared via `ctx.addReferenceObj`, so every task reuses
  * ONE set instance.
  *
  * Granularity: CODE POINTS (the LcpLen/MaxCharRun convention), so
  * piece lengths and the oracle's DuckDB `substr` arithmetic agree on
  * any text. Greedy MaxMatch is deterministic by construction — no
  * tie exists (one longest match per position). */
case class WordPieceEncode(child: Expression, vocab: Seq[String],
                           unk: String, maxPieceChars: Int)
  extends UnaryExpression {

  require(maxPieceChars >= 1, s"maxPieceChars must be >= 1, got $maxPieceChars")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_piece"

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(p => { s.add(p); () })
    s
  }

  /** Greedy MaxMatch over code points; whole-word unk on any gap. */
  def compute(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < n) {
      var len = math.min(maxPieceChars, n - pos)
      var m: String = null
      while (m == null && len >= 1) {
        val sub = new String(cps, pos, len)
        val cand = if (pos > 0) "##" + sub else sub
        if (vocabSet.contains(cand)) m = cand else len -= 1
      }
      if (m == null)
        return new GenericArrayData(Array[Any](UTF8String.fromString(unk)))
      out += UTF8String.fromString(m)
      pos += len
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(s: Any): Any = compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPiece", this, classOf[WordPieceEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

object WordPieceEncode {
  def word_piece(c: Column, vocab: Seq[String], unk: String = "[UNK]",
                 maxPieceChars: Int = 8): Column =
    ColumnBridge.column(
      WordPieceEncode(ColumnBridge.expression(c), vocab, unk, maxPieceChars))
}
