package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting via a precompiled Aho–Corasick
  * automaton (SURVEY.md §4 preference (b): a native codegen
  * Expression). The content-gate primitive [[graft.operators
  * .Blocklist]] does NOT cover: that operator matches curated PHRASES
  * at word boundaries through shingle equi-joins; this one counts raw
  * SUBSTRING occurrences (PII fragments, profanity stems, code
  * signatures, template markers) — including overlapping matches and
  * patterns nested inside other patterns — in ONE pass over the text.
  *
  * Why an automaton and not N `regexp_count` columns: N patterns as
  * separate scans cost N passes over every byte of a 100 TB corpus
  * (and regex engines return NON-overlapping counts besides). The
  * AC automaton, converted to dense DFA form at plan time (failure
  * links folded into the goto table), costs exactly one array lookup
  * per input byte regardless of N — the standard production shape for
  * large blocklists. The automaton is built ONCE per plan on the
  * driver and ships to executors as a codegen reference object.
  *
  * Byte-level matching is codepoint-exact on UTF-8: a pattern's first
  * byte is never a continuation byte, and UTF-8 is a prefix code, so
  * byte equality implies character alignment — which is what lets the
  * DuckDB oracle replay counts with character-position `substr`
  * probes (overlapping occurrences included).
  *
  * Returns `array<long>` of per-pattern counts in pattern order
  * (queries explode it to rows — the gate surface is scalar). NULL
  * text → NULL (callers route through nullToEmpty where NULL must
  * mean the empty document). */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  require(patterns.nonEmpty, "MultiPatternCount needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern")
  require(patterns.distinct.size == patterns.size, "duplicate patterns")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_multi_pattern_count"

  @transient private lazy val ac = MultiPatternCount.build(patterns)

  override def nullSafeEval(s: Any): Any =
    MultiPatternCount.compute(ac, s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac,
      classOf[MultiPatternCount.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.MultiPatternCount.compute($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object MultiPatternCount {

  /** Dense-DFA Aho–Corasick over bytes: `next(state)(byte)` is total
    * (failure links pre-folded), `hits(state)` lists the pattern
    * indices whose occurrence ENDS at this state (its own output plus
    * every suffix-pattern reachable through failure links). States ≤
    * total pattern bytes + 1. */
  final class Automaton(val next: Array[Array[Int]],
                        val hits: Array[Array[Int]],
                        val numPatterns: Int) extends Serializable

  def build(patterns: Seq[String]): Automaton = {
    val pats = patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val maxStates = pats.map(_.length).sum + 1
    val goto = Array.fill(maxStates, 256)(-1)
    val out = Array.fill(maxStates)(List.empty[Int])
    var states = 1
    // trie of the raw patterns
    for ((p, idx) <- pats.zipWithIndex) {
      var s = 0
      for (b <- p) {
        val c = b & 0xFF
        if (goto(s)(c) == -1) { goto(s)(c) = states; states += 1 }
        s = goto(s)(c)
      }
      out(s) = idx :: out(s)
    }
    // BFS failure links, folding outputs down and completing the goto
    // table into a DFA (the classic construction)
    val fail = Array.fill(states)(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    for (c <- 0 until 256) {
      if (goto(0)(c) == -1) goto(0)(c) = 0
      else { fail(goto(0)(c)) = 0; queue += goto(0)(c) }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ::: out(fail(s))
      for (c <- 0 until 256) {
        val t = goto(s)(c)
        if (t == -1) goto(s)(c) = goto(fail(s))(c)
        else { fail(t) = goto(fail(s))(c); queue += t }
      }
    }
    new Automaton(goto.take(states), out.take(states).map(_.toArray),
      patterns.size)
  }

  /** One pass: per input byte one DFA step; every output index at the
    * reached state is one (possibly overlapping) match ending here. */
  def compute(ac: Automaton, s: UTF8String): GenericArrayData = {
    val counts = new Array[Long](ac.numPatterns)
    val b = s.getBytes
    var state = 0
    var i = 0
    while (i < b.length) {
      state = ac.next(state)(b(i) & 0xFF)
      val hs = ac.hits(state)
      var k = 0
      while (k < hs.length) { counts(hs(k)) += 1L; k += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  def multi_pattern_count(c: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiPatternCount(ColumnBridge.expression(c), patterns))
}
