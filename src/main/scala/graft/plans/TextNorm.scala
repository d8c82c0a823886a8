package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as native codegen expressions (SURVEY.md §2
  * row 158) — the first gate of any multilingual corpus-hygiene
  * pipeline: the SAME text arrives from different crawls in composed
  * (U+00E9 é) and decomposed (e + U+0301) forms, so every exact-dedup
  * hash, shingle and vocabulary treats them as different documents
  * unless canonicalized first. Spark ships no normalizer at all
  * (`lower`/`translate` don't touch combining marks), so this is
  * preference (b) in §4: a custom Expression over a Scala UDF.
  *
  * Three modes, chosen for oracle replayability against DuckDB's
  * utf8proc-backed functions (probed, not assumed — see
  * TextNormSpec):
  *  - `nfc`: canonical composition (== DuckDB `nfc_normalize`);
  *  - `strip_accents`: NFC(NFD with combining marks (Mn) removed) —
  *    DuckDB `strip_accents` RECOMPOSES after stripping (probed via
  *    Hangul: NFD jamo return as the composed syllable), so we
  *    recompose too;
  *  - `nfkc`: compatibility composition (ligatures/width/circled
  *    forms fold: ﬁ→fi, ①→1) — no DuckDB twin, spec-pinned only.
  *
  * Scale shape (100 TB): the kernel takes ONE pass over the raw UTF-8
  * bytes first and returns the input UNCHANGED (no decode, no
  * allocation) when it is pure ASCII — which is the overwhelming
  * majority of crawl text — so the expensive java.text.Normalizer
  * round-trip is paid only by rows that can possibly change. Codegen
  * calls the same static kernel as the interpreted path.
  */
case class UnicodeNorm(child: Expression, mode: String)
    extends UnaryExpression {
  require(UnicodeNorm.Modes.contains(mode),
    s"mode must be one of ${UnicodeNorm.Modes.keys.mkString(", ")}, got $mode")

  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_unicode_$mode"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.compute(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"""graft.plans.UnicodeNorm.compute($c, "$mode")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

object UnicodeNorm {
  private[plans] val Modes: Map[String, Normalizer.Form] = Map(
    "nfc" -> Normalizer.Form.NFC,
    "nfkc" -> Normalizer.Form.NFKC,
    "strip_accents" -> Normalizer.Form.NFD) // NFD is the first step

  /** True iff every byte is < 0x80 — such strings are fixed points of
    * all three modes, so they pass through without decoding. */
  private def isAscii(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) return false
      i += 1
    }
    true
  }

  def compute(s: UTF8String, mode: String): UTF8String = {
    if (isAscii(s.getBytes)) return s
    val str = s.toString
    val out = mode match {
      case "strip_accents" =>
        val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(nfd.length)
        var i = 0
        while (i < nfd.length) {
          val cp = nfd.codePointAt(i)
          if (Character.getType(cp) != Character.NON_SPACING_MARK)
            sb.appendCodePoint(cp)
          i += Character.charCount(cp)
        }
        // utf8proc (DuckDB) recomposes after stripping — probed
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
      case m => Normalizer.normalize(str, Modes(m))
    }
    if (out == str) s else UTF8String.fromString(out)
  }

  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(UnicodeNorm(ColumnBridge.expression(c), "nfc"))
  def nfkc_normalize(c: Column): Column =
    ColumnBridge.column(UnicodeNorm(ColumnBridge.expression(c), "nfkc"))
  def strip_accents(c: Column): Column =
    ColumnBridge.column(UnicodeNorm(ColumnBridge.expression(c), "strip_accents"))
}
