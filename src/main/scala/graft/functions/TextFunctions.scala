package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Text-analysis column functions for training-data pipelines
  * (SURVEY.md §2.3 #42-45). All pure `functions._` compositions —
  * whole-stage-codegen'd, no UDFs, usable inside any plan.
  *
  * Regex subset is restricted to constructs with identical semantics in
  * Spark (Java regex) and DuckDB (RE2): character classes, `+`, `|`,
  * `\b`, `\s` (SURVEY.md §5).
  */
object TextFunctions {

  /** THE null-text posture, structurally (round-13 verdict item 6): a
    * NULL document tokenizes as the EMPTY document — zero tokens, zero
    * counts, no boundaries — never as NULL arrays that turn into
    * size() = -1 (legacy conf) / NULL (ANSI) denominators downstream,
    * and never as a row silently dropped by explode(NULL). Every
    * tokenizer in this object routes through here, so operators built
    * on them inherit the guard instead of re-remembering it (the
    * ttrGate/textTiling/ngramF1 bug class, commit ad608df). DuckDB
    * twin for oracles: coalesce(text, ''). */
  def nullToEmpty(c: Column): Column = coalesce(c, lit(""))

  /** Whitespace word tokens of the lowercased, NULL-guarded text —
    * the split-on-\s+ tokenizer family's single implementation (the
    * filter drops the '' artifact an empty/all-space doc leaves).
    * DuckDB twin: list_filter(string_split_regex(lower(coalesce(text,
    * '')), '\s+'), x -> x <> ''). */
  def wsTokens(c: Column): Column =
    filter(split(lower(nullToEmpty(c)), "\\s+"), w => w =!= "")

  /** Word tokens: maximal [A-Za-z0-9]+ runs (group 0 explicitly, to
    * match engines whose default group differs). NULL-guarded: a NULL
    * doc has [] tokens, not NULL. */
  def tokens(c: Column): Column =
    regexp_extract_all(nullToEmpty(c), lit("[A-Za-z0-9]+"), lit(0))

  /** §2.3#44 — token count (word-level). */
  def tokenCount(c: Column): Column = size(tokens(c)).cast(LongType)

  /** §2.3#44 — BPE-ish subword estimate: ~4 chars per subword token. */
  def bpeEstimate(c: Column): Column = ceil(length(c) / 4.0).cast(LongType)

  /** Whitespace-normalized, casefolded form (dedup normalization).
    * NULL-guarded: NULL normalizes to '' (groups with empty docs). */
  def normalize(c: Column): Column =
    lower(regexp_replace(trim(nullToEmpty(c)), "\\s+", " "))

  /** Words of the normalized text. */
  def words(c: Column): Column = split(normalize(c), " ")

  /** Exploded word tokens with the i-ahead words as __l1..__l{n-1} —
    * the shared machinery behind exploded shingles, gram hashes and
    * repetition stats. The lead value IS the (__pos+i)-th element of
    * the words array the explode already holds, so it is read by
    * codegen'd array indexing (GetArrayItem) at explode time instead
    * of a `lead()` window: the token stream never pays the window's
    * exchange + sort (guide §2.4 — remove shuffles outright), and the
    * first shuffle any consumer pays is its own (usually map-side
    * pre-aggregated, far smaller than the raw token stream). Unlike a
    * higher-order `transform` lambda (measured ~10x slower over a
    * 5k-doc corpus — HOF lambdas evaluate interpreted), indexing stays
    * inside whole-stage codegen. Rows and values are identical to the
    * lead-window form: positions are consecutive 0..size-1 within a
    * doc, so lead(i) == __ws[__pos+i], NULL past the doc end (the
    * `when` bound keeps ANSI mode from throwing on out-of-range).
    * Returns carry ++ (__pos, __w, __l1..__l{n-1}). */
  def tokenLeadRows(df: DataFrame, carry: Seq[Column], textCol: Column,
                    n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val base = df.select(carry :+ words(textCol).as("__ws"): _*)
    // carry expressions may be aliased — address them by their OUTPUT
    // names from here on (the aliasing projection has already run)
    val carried = base.columns.dropRight(1).map(col).toSeq
    base
      .select((carried :+ col("__ws")) :+
        posexplode(col("__ws")).as(Seq("__pos", "__w")): _*)
      .select((carried ++ Seq(col("__pos"), col("__w"))) ++
        (1 until n).map(i =>
          when(col("__pos") + i < size(col("__ws")),
            col("__ws").getItem(col("__pos") + i)).as(s"__l$i")): _*)
  }

  /** Exploded word n-gram shingles: one output row per (carry columns,
    * shingle) — [[tokenLeadRows]] + concat_ws, zero shuffles. */
  def shingleRows(df: DataFrame, carry: Seq[Column], textCol: Column,
                  n: Int = 3, out: String = "sh"): DataFrame = {
    val withLeads = tokenLeadRows(df, carry, textCol, n)
    (if (n == 1) withLeads else withLeads.filter(col(s"__l${n - 1}").isNotNull))
      .withColumn(out,
        concat_ws(" ", (col("__w") +: (1 until n).map(i => col(s"__l$i"))): _*))
      .drop(("__pos" +: "__w" +: (1 until n).map(i => s"__l$i")): _*)
  }

  /** Word n-gram shingles of the normalized text; empty if fewer than n
    * words (guards Spark's descending `sequence`). */
  def shingles(c: Column, n: Int = 3): Column = {
    val w = words(c)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(o => element_at(w, i + o)): _*)))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Character-class ratio helpers (quality scoring building blocks).
    * greatest(len, 1): an empty document must yield ratio 0, not a
    * divide-by-zero (ANSI) — the oracles guard identically. NULL text
    * takes the empty-document reading (ratio 0, not NULL). */
  def charClassRatio(c: Column, keepClass: String): Column = {
    val t = nullToEmpty(c)
    length(regexp_replace(t, keepClass, "")).cast(DoubleType) /
      greatest(length(t), lit(1))
  }

  def alphaRatio(c: Column): Column = charClassRatio(c, "[^A-Za-z]")
  def digitRatio(c: Column): Column = charClassRatio(c, "[^0-9]")
  def spaceRatio(c: Column): Column = charClassRatio(c, "[^ ]")

  /** §2.3#43 — scalar quality score: mostly-alphabetic text in a sane
    * token-count band scores high. Pure double arithmetic in a fixed
    * evaluation order (oracle-parity). */
  def qualityScore(c: Column): Column =
    lit(0.6) * alphaRatio(c) +
    lit(0.4) * when(tokenCount(c).between(20, 1000), 1.0).otherwise(0.0)

  /** Stopword marker patterns per language (language-ID heuristic). */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|a|in)\\b",
    "es" -> "\\b(el|la|de|que|y|en)\\b",
    "de" -> "\\b(der|die|und|ist|das)\\b",
    "fr" -> "\\b(le|les|des|et|dans)\\b")

  private def markerCount(c: Column, pat: String): Column =
    size(regexp_extract_all(lower(c), lit(pat), lit(0)))

  /** §2.3#42 — language ID: argmax of marker counts with a fixed
    * tie-break order (en > es > de > fr). */
  def langId(c: Column): Column = {
    val counts = langMarkers.map { case (l, p) => l -> markerCount(c, p) }
    val Seq(en, es, de, fr) = counts.map(_._2)
    when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }
}
