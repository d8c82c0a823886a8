package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.plans.{LcpLen, PolyHash64, UnicodeNorm}
import graft.sources.Tables

/** Corpus text hygiene (SURVEY.md §2 rows 158–160): Unicode
  * canonicalization, C4-style global line-level dedup, and
  * Pareto-frontier (skyline) multi-objective selection.
  *
  * These are the passes a web-scale training-data pipeline runs
  * BEFORE the document-level dedup stack: normalization makes
  * byte-identity mean text-identity (composed vs decomposed accents
  * otherwise split exact-dup groups), line dedup strips the
  * boilerplate that repeats ACROSS documents at a granularity
  * document-level near-dup misses (the C4 recipe: keep one global
  * occurrence of every line), and skyline selection picks the
  * quality/length frontier no scalar score can (a doc is dropped only
  * if some other doc beats it on EVERY axis).
  */
object Hygiene {

  // ---- Unicode normalization (row 158; expressions in plans.UnicodeNorm) ----

  /** Registered query: the corpus text is seeded with DECOMPOSED
    * accents (every 'e' -> 'e' + U+0301) deterministically in BOTH
    * engines, so the oracle exercises real composition, not an ASCII
    * no-op: NFC shortens the text back (combining pairs compose) and
    * strip_accents returns it to the original ASCII form —
    * `roundtrip_ok` proves the full circle per document. */
  def unicodeNormQ(s: SparkSession, dir: String): DataFrame = {
    val raw = regexp_replace(col("text"), "e", "e\u0301") // e + combining acute (decomposed)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), raw.as("raw"))
      .select(col("doc_id"),
        length(col("raw")).cast(LongType).as("len_raw"),
        length(UnicodeNorm.nfc_normalize(col("raw"))).cast(LongType).as("len_nfc"),
        (UnicodeNorm.strip_accents(UnicodeNorm.nfc_normalize(col("raw")))
          === col("text")).as("roundtrip_ok"))
      .orderBy(col("doc_id"))
  }

  // ---- Global line-level dedup (row 159; the C4 recipe) ----

  /** Keep the FIRST global occurrence (by (doc_id, line position)) of
    * every distinct line; reassemble each document from its surviving
    * lines. A document whose every line lost the race survives with
    * empty text (presence is not identity — downstream length gates
    * drop it explicitly).
    *
    * Scale shape (100 TB): the keep/drop DECISION never shuffles line
    * text — lines are keyed by the domain-prefixed [[PolyHash64]]
    * ("line|"), and the argmin-per-hash aggregation combines map-side
    * into a (hash, doc_id, pos) frame of ids only. Line text moves
    * through exactly two shuffles, the floor for this operator: the
    * equi-join of lines against their winning (doc_id, pos) ids, and
    * the per-document reassembly aggregation. No window over the
    * exploded frame, no driver materialization. */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("h", PolyHash64.poly_hash64(concat(lit("line|"), col("line"))))
    // ids-only argmin with map-side combine; struct order = (doc_id, pos)
    val firsts = lines
      .groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      .select(col("h"), col("f.doc_id").as("fdoc"), col("f.pos").as("fpos"))
    val kept = lines.join(firsts,
      lines("h") === firsts("h") &&
        col("doc_id") === col("fdoc") && col("pos") === col("fpos"))
    val rebuilt = kept
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("text_dedup"))
    docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        (size(split(col(textCol), "\n"))).cast(LongType).as("n_total"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** Registered query: documents get a deterministic line structure
    * (a newline after every 10th word — same regex, same engine-order
    * semantics in Java regex and RE2) and then the global line dedup.
    * Duplicate and near-duplicate documents in the corpus make the
    * kept-fraction a real signal, exactly as C4's line dedup fires on
    * cross-site boilerplate. */
  def dedupLinesQ(s: SparkSession, dir: String): DataFrame = {
    val structured = Tables.documents(s, dir)
      .select(col("doc_id"),
        regexp_replace(col("text"), "((?:\\S+ ){9}\\S+) ", "$1\n").as("text"))
    dedupLines(structured, "doc_id", "text").orderBy(col("doc_id"))
  }

  // ---- Frequency truecasing (row 176) ----

  /** Corpus-frequency truecasing — rewrite every token to its
    * MAJORITY surface form across the corpus (ties break
    * lexicographically): the casing-repair gate multilingual pipelines
    * run on OCR dumps, ALL-CAPS shouting, headline-cased titles and
    * MiXeD crawl junk (Lita et al., ACL 2003 "tRuEcasIng"). Exact
    * dedup, shingling and vocabularies all fracture on casing that
    * normalization-by-lowercasing would destroy information to fix —
    * truecasing folds variants onto the corpus's own dominant form
    * instead ("nasa" → "NASA", "THE" → "the").
    *
    * Scale shape: surface-form votes are ONE map-side-combined groupBy
    * over (lower(token), token) — vocabulary-bounded output; the
    * canonical pick is an argmax on that frame via min(struct(-count,
    * token)) (no window — a celebrity token costs a wide aggregate,
    * the LPA posture); the rewrite is an equi-join of the positional
    * token stream against the (lower → canonical) map keyed on the
    * lowercased token, then the dedupLines two-shuffle reassembly
    * (per-doc sort_array over collected (pos, token) structs). Output
    * is the truecased TOKEN STREAM (the training-corpus canonical
    * form), not a lossless rewrite — inter-token bytes are the
    * tokenizer's to drop. Token-free docs survive as ("", 0) rows via
    * the document spine (presence ≠ identity, the dedupLines rule). */
  def truecase(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(regexp_extract_all(col(textCol), lit("[A-Za-z0-9]+"), lit(0)))
          .as(Seq("pos", "tk")))
      .withColumn("lt", lower(col("tk")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val canon = tok
      .groupBy(col("lt"), col("tk")).agg(count(lit(1)).as("c"))
      .groupBy(col("lt"))
      .agg(min(struct((-col("c")).as("nc"), col("tk"))).as("m"))
      .select(col("lt"), col("m.tk").as("ct"))
    val rebuilt = tok.join(canon, Seq("lt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tk") =!= col("ct"), 1L).otherwise(0L)).as("n_changed"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("ct")))),
            x => x.getField("ct")), " ").as("truecased"))
    docs.select(col(idCol).cast(LongType).as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_changed"), lit(0L)).as("n_changed"),
        coalesce(col("truecased"), lit("")).as("truecased"))
  }

  /** Registered query: the corpus is seeded with deterministic case
    * damage IN BOTH ENGINES (doc_id%7=0 → ALL-CAPS, %7=1 → 'table'
    * headline-cased; upper/regexp_replace have identical Java/RE2
    * semantics on ASCII), so the oracle exercises real majority-vote
    * repair — the lowercase majority wins the vote and the damaged
    * docs fold back, the unicode-norm seeding precedent. */
  def truecaseQ(s: SparkSession, dir: String): DataFrame = {
    val damaged = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0, upper(col("text")))
          .when(pmod(col("doc_id"), lit(7)) === 1,
            regexp_replace(col("text"), "table", "Table"))
          .otherwise(col("text")).as("text"))
    truecase(damaged, "doc_id", "text").orderBy(col("doc_id"))
  }

  // ---- Charset anomaly filter (row 187) ----

  /** Byte-level charset anomaly report (SURVEY.md §2 row 187) — the
    * cheapest hygiene gate a crawl pipeline runs, BEFORE tokenization:
    * per document, code-point count vs byte count (their gap counts
    * multibyte characters — a spike in nominally-ASCII English is
    * mojibake or homoglyph spam), C0 control characters (binary junk
    * leaking through an extractor), and U+FFFD replacement characters
    * (an upstream decoder already gave up). The suspect flag fires on
    * any control/replacement character or a multibyte share above
    * `pctMax` percent — integer cross-multiplied, no division.
    *
    * A Cyrillic 'а' in Latin text is invisible to every token-level
    * filter (it changes the token, silently) — THIS is the layer that
    * sees it, which is why the check runs on bytes, not tokens. Pure
    * per-row projection: zero shuffles beyond the caller's sink;
    * every count is one regexp over the row (codegen'd). */
  def charsetAnomalies(docs: DataFrame, idCol: String, textCol: String,
                       pctMax: Int = 5): DataFrame = {
    val t = col(textCol)
    def charsOf(c: Column) = length(c).cast(LongType)
    val nChars = charsOf(t)
    val ascii = charsOf(regexp_replace(t, "[^\\x00-\\x7F]", ""))
    docs.select(col(idCol).cast(LongType).as("doc_id"),
        nChars.as("n_chars"),
        octet_length(t).cast(LongType).as("n_bytes"),
        (nChars - ascii).as("n_nonascii"),
        (charsOf(regexp_replace(t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "XX")) - nChars).as("n_ctl"),
        (charsOf(regexp_replace(t, "�", "XX")) - nChars).as("n_replacement"))
      .select(col("doc_id"), col("n_chars"), col("n_bytes"),
        col("n_nonascii"), col("n_ctl"), col("n_replacement"),
        (col("n_ctl") > 0 || col("n_replacement") > 0 ||
          col("n_nonascii") * 100 > col("n_chars") * pctMax).as("suspect"))
  }

  /** Registered query: deterministic damage seeded IN BOTH ENGINES
    * (the truecase precedent) — doc_id%11=0 swaps 'a' for Cyrillic
    * 'а' (the homoglyph token filters can't see), %11=1 injects a BEL
    * control character — so the oracle exercises every detector. */
  def charsetQ(s: SparkSession, dir: String): DataFrame = {
    val damaged = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(11)) === 0,
            regexp_replace(col("text"), "a", "а"))
          .when(pmod(col("doc_id"), lit(11)) === 1,
            concat(col("text"), lit("\u0007")))
          .otherwise(col("text")).as("text"))
    charsetAnomalies(damaged, "doc_id", "text", pctMax = 5)
      .orderBy(col("doc_id"))
  }

  // ---- Mojibake repair (row 243) ----

  /** ftfy-lite double-encoding repair (SURVEY.md §2 row 243) — the
    * REPAIR companion to the row-187 charset detector: text whose
    * UTF-8 bytes were once read as Latin-1 shows the signature pair
    * pattern (a char in U+00C2–U+00DF — a UTF-8 lead byte misread as
    * Latin-1 — followed by a continuation-range char U+0080–U+00BF:
    * "café" arrives as "cafÃ©"). The fix is the inverse read:
    * re-encode as Latin-1 and decode as UTF-8. Guarded twice, because
    * Spark 4's decode THROWS on malformed bytes: the signature must
    * be present AND `is_valid_utf8` must hold on the re-encoded
    * bytes — a lone 'Ã' before ASCII (not mojibake) fails the
    * signature, a genuinely mixed page fails the validity check, and
    * both keep their original text. Covers the dominant 2-byte
    * (Latin/extended) mojibake class; pure per-row projection, zero
    * shuffles. */
  def mojibakeRepair(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = col(textCol)
    val sigPat = "[\u00C2-\u00DF][\u0080-\u00BF]"
    val bytes = encode(s, "ISO-8859-1")
    // three guards: the signature pair must appear; every char must be
    // Latin-1-mappable (encode substitutes '?' for anything above
    // U+00FF BEFORE validity could notice \u2014 a mixed mojibake+emoji
    // page must stay untouched, not half-repaired \u2014 the negated class
    // [^\x00-\xFF] catches supplementary-plane code points too,
    // which a [\u0100-\uFFFF] range would miss since Java regex
    // classes match by CODE POINT and U+1F600 sits above U+FFFF); and
    // the re-read bytes must be valid UTF-8 (Spark 4's decode throws
    // otherwise)
    val fixable = s.rlike(sigPat) && !s.rlike("[^\\x00-\\xFF]") &&
      is_valid_utf8(bytes)
    val repaired = when(fixable, decode(bytes, "UTF-8")).otherwise(s)
    docs.select(col(idCol).cast(LongType).as("doc_id"),
      size(regexp_extract_all(s, lit(sigPat), lit(0))).cast(LongType).as("n_seqs"),
      (repaired =!= s).as("changed"),
      repaired.as("text_fixed"))
  }

  /** Registered query: four deterministic seedings IN BOTH ENGINES —
    * real mojibake ('a'→"Ã¡", 'o'→"Ã¶": must repair to á/ö), a real
    * accent ('e'→é: no signature, untouched), a signature trap
    * ("Ãx": lead char before ASCII, untouched), and clean rows. The
    * oracle replays the OUTCOME via the literal seed map (ASCII base
    * text ⇒ the generic roundtrip equals the map); the generic-path
    * equivalence on non-seeded inputs is spec-pinned. */
  def mojibakeQ(s: SparkSession, dir: String): DataFrame = {
    val seeded = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(6)) === 0,
            regexp_replace(col("text"), "a", "Ã¡"))
          .when(pmod(col("doc_id"), lit(6)) === 1,
            regexp_replace(col("text"), "e", "é"))
          .when(pmod(col("doc_id"), lit(6)) === 2,
            concat(col("text"), lit(" Ãx")))
          .when(pmod(col("doc_id"), lit(6)) === 3,
            regexp_replace(col("text"), "o", "Ã¶"))
          .otherwise(col("text")).as("text"))
    mojibakeRepair(seeded, "doc_id", "text").orderBy(col("doc_id"))
  }

  // ---- Group-LCP template detection (row 178) ----

  /** Longest common prefix per group (SURVEY.md §2 row 178) — the
    * template detector for crawl corpora: pages generated from one
    * site template share a long literal prefix (header boilerplate,
    * breadcrumbs, legal banners) that line/segment dedup only catches
    * if the template happens to align with line breaks. A long group
    * LCP is the "this source is templated" diagnostic that routes the
    * group to prefix-stripping.
    *
    * Scale = the LCP(min, max) identity: under lexicographic order
    * every string of the group sorts between min and max, so the LCP
    * of the whole SET equals LCP(min, max) — corpus-wide LCP costs
    * ONE associative min/max aggregation (map-side combined, any
    * group count, any corpus size) plus one O(prefix) scalar per
    * group ([[graft.plans.LcpLen]], codegen'd, code-point-exact).
    * NULL texts carry no prefix evidence: min/max skip them; a group
    * of only NULLs reports NULL lcp. */
  def groupLcp(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val agg = df.groupBy(col(groupCol))
      .agg(count(col(textCol)).as("n_docs"),
        min(col(textCol)).as("mn"), max(col(textCol)).as("mx"))
    agg.withColumn("lcp_len", LcpLen.lcp_len(col("mn"), col("mx")))
      .select(col(groupCol), col("n_docs"), col("lcp_len"),
        col("mn").substr(lit(1), coalesce(col("lcp_len"), lit(0L)).cast("int"))
          .as("prefix"))
  }

  /** Registered query: per-source LCP with a deterministic template
    * seeded IN BOTH ENGINES ('[source] ' prepended — the truecase
    * damage-seeding precedent), so the oracle exercises real template
    * discovery: the LCP must recover at least the seeded header and
    * exactly whatever common continuation the corpus adds. */
  def templatePrefixQ(s: SparkSession, dir: String): DataFrame = {
    val seeded = Tables.documents(s, dir)
      .select(col("source"),
        concat(lit("["), col("source"), lit("] "), col("text")).as("text"))
    groupLcp(seeded, "source", "text").orderBy(col("source"))
  }

  // ---- Pareto-frontier (skyline) selection (row 160) ----

  /** Skyline over two maximized integer metrics: keep a row iff no
    * other row is >= on both axes and > on at least one. Classic
    * two-pass decomposition, all distributed:
    *  1. collapse to one (m1, max m2) row per distinct m1 — a hash
    *     aggregation with map-side combine;
    *  2. running max over that DISTINCT-m1 frame ordered by m1 DESC
    *     (strictly-preceding rows = strictly larger m1) — the only
    *     unpartitioned window, riding a frame bounded by |distinct
    *     m1| (the value domain, e.g. max document length), never the
    *     corpus;
    *  3. broadcast the frontier-per-m1 frame back onto the full data.
    * A row survives iff it achieves its m1-class max AND beats the
    * best m2 among all strictly-larger m1 (ties on both axes are
    * mutually non-dominating — both kept). */
  def skyline2(df: DataFrame, m1: Column, m2: Column, out: Seq[String]): DataFrame = {
    val m = df.select(out.map(col) :+ m1.as("__m1") :+ m2.as("__m2"): _*)
    val pm = m.groupBy(col("__m1")).agg(max(col("__m2")).as("__mm"))
    val wAbove = Window.orderBy(col("__m1").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val fr = pm.withColumn("__above", max(col("__mm")).over(wAbove))
    m.join(broadcast(fr), Seq("__m1"))
      .filter(col("__m2") === col("__mm") &&
        (col("__above").isNull || col("__m2") > col("__above")))
      .select(out.map(col) :+ col("__m1") :+ col("__m2"): _*)
  }

  /** Registered query: the (n_chars, distinct-word-count) frontier of
    * the documents table — the docs no other doc dominates on both
    * length and lexical diversity. */
  def paretoSelectQ(s: SparkSession, dir: String): DataFrame =
    skyline2(Tables.documents(s, dir),
        col("n_chars"),
        size(array_distinct(split(col("text"), " "))).cast(LongType),
        Seq("doc_id"))
      .select(col("doc_id"), col("__m1").as("n_chars"),
        col("__m2").as("n_distinct"))
      .orderBy(col("doc_id"))

  // ---- Character-run spam gate (row 213; expression in plans.MaxCharRun) --

  /** §2 row 213 — longest identical-code-point run per document, with
    * deterministic run damage seeded IN BOTH ENGINES (every 7th doc
    * gets a '!' run of length doc_id%13+3 appended) so real runs
    * exercise the flag; flagged at run ≥ 8 (the key-mash/separator-art
    * gate; token-level repetition filters can't see a run — it is ONE
    * token). Pure per-row codegen'd projection, zero shuffles. */
  def charRunsQ(s: SparkSession, d: String): DataFrame = {
    val seeded = Tables.documents(s, d).select(col("doc_id"),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"),
          repeat(lit("!"), (pmod(col("doc_id"), lit(13)) + 3)
            .cast(org.apache.spark.sql.types.IntegerType))))
        .otherwise(col("text")).as("t"))
    seeded.select(col("doc_id"),
        graft.plans.MaxCharRun.max_char_run(col("t")).as("max_run"))
      .withColumn("flagged", col("max_run") >= 8L)
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mojibake"      -> (mojibakeQ _),
    "q_char_runs"     -> (charRunsQ _),
    "q_unicode_norm"  -> (unicodeNormQ _),
    "q_dedup_lines"   -> (dedupLinesQ _),
    "q_pareto_select" -> (paretoSelectQ _),
    "q_truecase"      -> (truecaseQ _),
    "q_charset"       -> (charsetQ _),
    "q_template_prefix" -> (templatePrefixQ _))

  val oracles: Map[String, String] = Map(
    // the oracle replays the OUTCOME of the roundtrip via the literal
    // seed map — sound because the base text is ASCII, so the generic
    // Latin-1→UTF-8 re-read touches exactly the seeded pairs; n_seqs
    // counts signature pairs = seeded replacements (1 char each in
    // the source text); the trap and real-accent rows change nothing
    "q_mojibake" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    CASE WHEN doc_id % 6 = 0 THEN regexp_replace(text, 'a', 'Ã¡', 'g')
        |         WHEN doc_id % 6 = 1 THEN regexp_replace(text, 'e', 'é', 'g')
        |         WHEN doc_id % 6 = 2 THEN text || ' Ãx'
        |         WHEN doc_id % 6 = 3 THEN regexp_replace(text, 'o', 'Ã¶', 'g')
        |         ELSE text END AS seeded,
        |    CASE WHEN doc_id % 6 = 0 THEN regexp_replace(text, 'a', 'á', 'g')
        |         WHEN doc_id % 6 = 1 THEN regexp_replace(text, 'e', 'é', 'g')
        |         WHEN doc_id % 6 = 2 THEN text || ' Ãx'
        |         WHEN doc_id % 6 = 3 THEN regexp_replace(text, 'o', 'ö', 'g')
        |         ELSE text END AS fixed
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 6 = 0
        |         THEN length(text) - length(replace(text, 'a', ''))
        |       WHEN doc_id % 6 = 3
        |         THEN length(text) - length(replace(text, 'o', ''))
        |       ELSE 0 END AS BIGINT) AS n_seqs,
        |  fixed <> seeded AS changed,
        |  fixed AS text_fixed
        |FROM s ORDER BY doc_id""".stripMargin,
    // same '!'-run seeding; runs replayed WITHOUT regex backreferences
    // (RE2 has none): run starts are positions whose char differs from
    // the previous one, run lengths are gaps between consecutive
    // starts (L+1 sentinel), max over the list; chars == code points
    // in DuckDB substr, matching MaxCharRun's counting unit
    "q_char_runs" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || repeat('!', CAST(doc_id % 13 + 3 AS INTEGER))
        |      ELSE text END AS t
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT) ELSE (
        |      SELECT CAST(MAX(COALESCE(starts[CAST(k + 1 AS INTEGER)], length(t) + 1)
        |                      - starts[CAST(k AS INTEGER)]) AS BIGINT)
        |      FROM (SELECT list_filter(range(1, length(t) + 1),
        |              i -> i = 1 OR substr(t, CAST(i AS INTEGER), 1)
        |                     <> substr(t, CAST(i - 1 AS INTEGER), 1)) AS starts) s,
        |           LATERAL (SELECT unnest(range(1, len(starts) + 1)) AS k) ks
        |    ) END AS max_run
        |  FROM d)
        |SELECT doc_id, max_run, max_run >= 8 AS flagged
        |FROM r ORDER BY doc_id""".stripMargin,

    // same damage seeding (Cyrillic homoglyph swap / BEL injection);
    // length = chars, strlen = bytes in DuckDB; control/replacement
    // counts via the double-expansion trick (replace each hit with
    // TWO chars, diff the lengths); suspect threshold cross-multiplied
    "q_charset" ->
      """WITH seeded AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN regexp_replace(text, 'a', 'а', 'g')
        |         WHEN doc_id % 11 = 1 THEN text || chr(7)
        |         ELSE text END AS text
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(strlen(text) AS BIGINT) AS n_bytes,
        |    CAST(length(text) - length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) AS BIGINT) AS n_nonascii,
        |    CAST(length(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]', 'XX', 'g')) - length(text) AS BIGINT) AS n_ctl,
        |    CAST(length(regexp_replace(text, '�', 'XX', 'g')) - length(text) AS BIGINT) AS n_replacement
        |  FROM seeded)
        |SELECT doc_id, n_chars, n_bytes, n_nonascii, n_ctl, n_replacement,
        |  (n_ctl > 0 OR n_replacement > 0 OR n_nonascii * 100 > n_chars * 5) AS suspect
        |FROM m
        |ORDER BY doc_id""".stripMargin,

    // same template seeding; group min/max, then the first divergent
    // character position over a LATERAL position range (floored at 1
    // so an empty-min group still yields its lcp=0 row: substr('',1,1)
    // = '' differs from any non-empty char); DuckDB length/substr are
    // character-based, matching the engine's code-point contract
    "q_template_prefix" ->
      """WITH seeded AS (
        |  SELECT source, '[' || source || '] ' || text AS text FROM documents),
        |mm AS (SELECT source, COUNT(text) AS n_docs,
        |         MIN(text) AS mn, MAX(text) AS mx
        |       FROM seeded GROUP BY source),
        |lc AS (
        |  SELECT m.source, m.n_docs, m.mn,
        |    COALESCE(MIN(CASE WHEN substr(m.mn, CAST(i + 1 AS INT), 1)
        |                        <> substr(m.mx, CAST(i + 1 AS INT), 1)
        |                      THEN i END),
        |             least(length(m.mn), length(m.mx))) AS lcp_len
        |  FROM mm m, LATERAL (SELECT unnest(range(0,
        |    greatest(least(length(m.mn), length(m.mx)), 1))) AS i) _i
        |  GROUP BY m.source, m.n_docs, m.mn, m.mx)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(lcp_len AS BIGINT) AS lcp_len,
        |  substr(mn, 1, CAST(lcp_len AS INT)) AS prefix
        |FROM lc
        |ORDER BY source""".stripMargin,

    // same damage seeding, positional tokens via LATERAL range unnest,
    // ROW_NUMBER (count DESC, token ASC) == the engine's
    // min(struct(-c, tk)) argmax, ordered string_agg reassembly,
    // document spine keeps token-free rows
    "q_truecase" ->
      """WITH seeded AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN upper(text)
        |         WHEN doc_id % 7 = 1 THEN regexp_replace(text, 'table', 'Table', 'g')
        |         ELSE text END AS text
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos, l[i + 1] AS tk,
        |    lower(l[i + 1]) AS lt
        |  FROM (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+', 0) AS l
        |        FROM seeded) t,
        |    LATERAL (SELECT unnest(range(0, len(l))) AS i) _i),
        |votes AS (SELECT lt, tk, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |canon AS (SELECT lt, tk AS ct FROM (
        |    SELECT lt, tk, ROW_NUMBER() OVER (PARTITION BY lt
        |      ORDER BY c DESC, tk ASC) AS rn FROM votes) v
        |  WHERE rn = 1),
        |rebuilt AS (
        |  SELECT t.doc_id, COUNT(*) AS n_tokens,
        |    SUM(CASE WHEN t.tk <> c.ct THEN 1 ELSE 0 END) AS n_changed,
        |    string_agg(c.ct, ' ' ORDER BY t.pos) AS truecased
        |  FROM tok t JOIN canon c ON t.lt = c.lt
        |  GROUP BY t.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(r.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(r.n_changed, 0) AS BIGINT) AS n_changed,
        |  COALESCE(r.truecased, '') AS truecased
        |FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // decomposed seeding (chr(769) = U+0301 combining acute) replayed
    // with DuckDB's utf8proc normalizers; length() counts codepoints
    // on both engines
    "q_unicode_norm" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text, 'e', 'e' || chr(769), 'g') AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(raw) AS BIGINT) AS len_raw,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
        |  strip_accents(nfc_normalize(raw)) = text AS roundtrip_ok
        |FROM d ORDER BY doc_id""".stripMargin,

    // same line synthesis (RE2 replace mirrors Java's), same
    // "line|"-prefixed hash identity via the shared HUGEINT replay,
    // first occurrence by (doc_id, pos), string_agg reassembly in
    // position order; LEFT JOIN keeps fully-deduped docs as ''
    "q_dedup_lines" -> {
      s"""WITH d AS (
         |  SELECT doc_id,
         |    regexp_replace(text, '((?:\\S+ ){9}\\S+) ', '\\1' || chr(10), 'g') AS t
         |  FROM documents),
         |l AS (
         |  SELECT doc_id,
         |    unnest(string_split(t, chr(10))) AS line,
         |    unnest(generate_series(1, len(string_split(t, chr(10))))) AS pos
         |  FROM d),
         |dl AS (SELECT DISTINCT line AS ln FROM l),
         |hs AS (${TrainingOps.polyHashSql("line|", "dl", "ln")}),
         |lh AS (SELECT l.doc_id, l.line, l.pos, hs.h
         |       FROM l JOIN hs ON l.line = hs.ln),
         |rk AS (
         |  SELECT doc_id, line, pos,
         |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
         |  FROM lh),
         |rebuilt AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |    string_agg(line, chr(10) ORDER BY pos) AS text_dedup
         |  FROM rk WHERE rn = 1 GROUP BY doc_id),
         |tot AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_total
         |  FROM d)
         |SELECT tot.doc_id, tot.n_total,
         |  COALESCE(rebuilt.n_kept, 0) AS n_kept,
         |  COALESCE(rebuilt.text_dedup, '') AS text_dedup
         |FROM tot LEFT JOIN rebuilt ON tot.doc_id = rebuilt.doc_id
         |ORDER BY tot.doc_id""".stripMargin
    },

    // per-m1 max, running max over strictly-larger m1 (one row per
    // distinct m1 -> ROWS frame is exact), frontier filter
    "q_pareto_select" ->
      """WITH m AS (
        |  SELECT doc_id, n_chars AS m1,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS m2
        |  FROM documents),
        |pm AS (SELECT m1, MAX(m2) AS mm FROM m GROUP BY m1),
        |fr AS (
        |  SELECT m1, mm,
        |    MAX(mm) OVER (ORDER BY m1 DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS above
        |  FROM pm)
        |SELECT doc_id, CAST(m.m1 AS BIGINT) AS n_chars, m2 AS n_distinct
        |FROM m JOIN fr ON m.m1 = fr.m1
        |WHERE m2 = mm AND (above IS NULL OR m2 > above)
        |ORDER BY doc_id""".stripMargin)
}
