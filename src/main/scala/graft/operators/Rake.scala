package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** RAKE keyword extraction (SURVEY.md §2 row 177) — Rapid Automatic
  * Keyword Extraction (Rose et al. 2010): candidate phrases are the
  * maximal token runs between stopword/punctuation boundaries; each
  * word scores by its co-occurrence degree within the document's own
  * candidates; a phrase scores as the sum of its words' scores; the
  * top phrase is the document's keyword. The metadata-enrichment stage
  * training-data and search pipelines run to tag documents with their
  * salient multi-word terms — no model, no corpus statistics, purely
  * per-document (the paper's defining property).
  *
  * Scoring is the paper's deg(w) metric — deg(w) = Σ over the doc's
  * candidate occurrences of w of that phrase's length (co-occurrence
  * count including self): pure integers, so both engines replay the
  * ranking hash-exactly. (The paper's deg/freq ratio variant sums
  * per-word RATIONALS with different denominators — not a
  * display-time division — so the integer-exact contract picks the
  * deg metric the paper evaluates alongside it; freq is emitted too.)
  *
  * Boundaries: the tokenizer extracts `[a-z0-9]+|[^a-z0-9\s]+` over
  * lowercased text (identical Java/RE2 semantics) — word runs AND
  * punctuation runs; a token is a boundary iff it is punctuation or
  * in the fixed stopword list. Punctuation-as-boundary is load-bearing
  * ("fast, merge" is two phrases, not one) and a dropped-punctuation
  * tokenizer would silently glue sentences.
  *
  * Scale shape: embarrassingly parallel by construction — ONE per-doc
  * window (the boundary running count; doc-bounded partitions), then
  * every aggregation and join is keyed (doc_id, …): phrase assembly,
  * word stats and phrase scoring all co-partition on doc_id, no
  * vocabulary-wide or corpus-wide state anywhere. Candidates longer
  * than `maxLen` are dropped BEFORE stats (word stats are over
  * surviving candidates). The documents spine keeps candidate-free
  * docs as NULL rows — "nothing extractable" is the signal. */
object Rake {

  /** Fixed stopword list — constants, identical in both engines. */
  private[graft] val StopWords =
    Seq("a", "the", "and", "of", "to", "in", "is", "it", "for", "on")

  private val BoundaryTokenPattern = "[a-z0-9]+|[^a-z0-9\\s]+"

  /** (doc_id, phrase, score, freq_sum, n_words) — the argmax candidate
    * per document (score DESC, phrase ASC); NULL row when the document
    * yields no candidate of length <= maxLen. */
  def topPhrase(docs: DataFrame, idCol: String, textCol: String,
                maxLen: Int = 4): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    val tok = docs.select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(regexp_extract_all(lower(col(textCol)),
          lit(BoundaryTokenPattern), lit(0))).as(Seq("pos", "tk")))
      .withColumn("stop",
        !col("tk").rlike("^[a-z0-9]") || col("tk").isInCollection(StopWords))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val words = tok
      .withColumn("g", sum(when(col("stop"), 1L).otherwise(0L)).over(w))
      .filter(!col("stop"))
      .select(col("doc_id"), col("g"), col("pos"), col("tk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val phrases = words.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("len"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("tk")))),
            x => x.getField("tk")), " ").as("phrase"))
      .filter(col("len") <= maxLen)
    val pw = words.join(phrases.select(col("doc_id"), col("g"), col("len")),
      Seq("doc_id", "g"))
    val stats = pw.groupBy(col("doc_id"), col("tk"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
    val scored = pw.join(stats, Seq("doc_id", "tk"))
      .groupBy(col("doc_id"), col("g"))
      .agg(sum(col("deg")).as("score"), sum(col("freq")).as("freq_sum"))
      .join(phrases, Seq("doc_id", "g"))
    val top = scored.groupBy(col("doc_id"))
      .agg(min(struct((-col("score")).as("ns"), col("phrase").as("p"),
        col("freq_sum").as("fs"), col("len").as("nw"))).as("m"))
      .select(col("doc_id"), col("m.p").as("phrase"),
        (-col("m.ns")).as("score"), col("m.fs").as("freq_sum"),
        col("m.nw").as("n_words"))
    docs.select(col(idCol).cast(LongType).as("doc_id"))
      .join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("phrase"), col("score"),
        col("freq_sum"), col("n_words"))
  }

  /** §2 row 177 — top RAKE phrase per document, maxLen 4. */
  def rakeQ(s: SparkSession, d: String): DataFrame =
    topPhrase(Tables.documents(s, d), "doc_id", "text", maxLen = 4)
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rake_keywords" -> (rakeQ _))

  val oracles: Map[String, String] = Map(
    // same boundary tokenizer, boundary running count, ordered
    // string_agg phrases, per-doc integer deg/freq stats, ROW_NUMBER
    // (score DESC, phrase ASC) == the engine's min(struct(-score,
    // phrase)) argmax; documents spine via LEFT JOIN
    "q_rake_keywords" -> {
      val stops = StopWords.map(s => s"'$s'").mkString(", ")
      s"""WITH tok AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos, l[i + 1] AS tk,
         |    NOT regexp_matches(l[i + 1], '^[a-z0-9]')
         |      OR l[i + 1] IN ($stops) AS stop
         |  FROM (SELECT doc_id,
         |          regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]+', 0) AS l
         |        FROM documents) t,
         |    LATERAL (SELECT unnest(range(0, len(l))) AS i) _i),
         |words AS (
         |  SELECT doc_id, g, pos, tk FROM (
         |    SELECT *, SUM(CASE WHEN stop THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY doc_id ORDER BY pos) AS g
         |    FROM tok) x
         |  WHERE NOT stop),
         |phrases AS (
         |  SELECT doc_id, g, COUNT(*) AS len,
         |    string_agg(tk, ' ' ORDER BY pos) AS phrase
         |  FROM words GROUP BY 1, 2
         |  HAVING COUNT(*) <= 4),
         |pw AS (
         |  SELECT w.doc_id, w.g, w.tk, p.len
         |  FROM words w JOIN phrases p ON w.doc_id = p.doc_id AND w.g = p.g),
         |stats AS (
         |  SELECT doc_id, tk, COUNT(*) AS freq, SUM(len) AS deg
         |  FROM pw GROUP BY 1, 2),
         |scored AS (
         |  SELECT pw.doc_id, pw.g, SUM(s.deg) AS score, SUM(s.freq) AS freq_sum
         |  FROM pw JOIN stats s ON pw.doc_id = s.doc_id AND pw.tk = s.tk
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT doc_id, phrase, score, freq_sum, len FROM (
         |    SELECT sc.doc_id, p.phrase, sc.score, sc.freq_sum, p.len,
         |      ROW_NUMBER() OVER (PARTITION BY sc.doc_id
         |        ORDER BY sc.score DESC, p.phrase ASC) AS rn
         |    FROM scored sc JOIN phrases p
         |      ON sc.doc_id = p.doc_id AND sc.g = p.g) r
         |  WHERE rn = 1)
         |SELECT d.doc_id, t.phrase, CAST(t.score AS BIGINT) AS score,
         |  CAST(t.freq_sum AS BIGINT) AS freq_sum,
         |  CAST(t.len AS BIGINT) AS n_words
         |FROM documents d LEFT JOIN top t ON d.doc_id = t.doc_id
         |ORDER BY d.doc_id""".stripMargin
    })
}
