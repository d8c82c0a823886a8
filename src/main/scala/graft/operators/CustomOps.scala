package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{SmallestK, TextFunctions}
import graft.plans.RollingMinHash.rolling_min_hash
import graft.plans.SpaceSavingTopK.topk_freq
import graft.sources.Tables

/** Queries backed by graft's custom Catalyst pieces (SURVEY.md §4:
  * preference (b) — native Expression; typed Aggregator). */
object CustomOps {

  /** Native rolling-minhash fingerprint per document. Oracle-backed:
    * the DuckDB side replays the same Karp-Rabin + splitmix64 kernel
    * with 64-bit wraparound emulated in HUGEINT (see oracles below);
    * the spec additionally pins interpreted == codegen. */
  def rollingFingerprintQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        rolling_min_hash(col("text"), 8).as("fp"))
      .orderBy(col("doc_id"))

  /** Deterministic min-wise sample: the 3 docs with smallest md5(text)
    * per language, via the map-side-combinable SmallestK aggregator
    * (shuffle carries <= 3 rows per group per map task — the window
    * formulation the oracle uses would sort the whole corpus). */
  def samplePerGroupQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = new SmallestK(3).toColumn
    val sampled = Tables.documents(s, d)
      .select(col("lang"), md5(col("text")).as("h"), col("doc_id"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("ids"))
    sampled.toDF("lang", "ids")
      .select(col("lang"), posexplode(col("ids")).as(Seq("pos", "doc_id")))
      .select(col("lang"), (col("pos") + 1).cast(LongType).as("rn"), col("doc_id"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Top-10 tokens per language via the SpaceSaving sketch. Capacity
    * (100k) far exceeds the corpus vocabulary, so the sketch is exact
    * here and the oracle can pin it with the window formulation; at
    * 100 TB the same plan runs with bounded memory where the exact
    * formulation shuffles every distinct token. */
  def topTokensQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"))
      .agg(topk_freq(col("tok"), 10, 100000).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "tc")))
      .select(col("lang"), (col("pos") + 1).cast(LongType).as("rn"),
        col("tc.item").as("token"), col("tc.cnt").as("cnt"))
      .orderBy(col("lang"), col("rn"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rolling_fingerprint" -> (rollingFingerprintQ _),
    "q_sample_per_group"    -> (samplePerGroupQ _),
    "q_top_tokens"          -> (topTokensQ _),
  )

  val oracles: Map[String, String] = Map(
    // Karp-Rabin rolling min-hash replayed in DuckDB: the corpus is
    // pure ASCII — ENFORCED by the guard CTE, which hard-errors the
    // oracle run if a regenerated corpus ever contains a multi-byte
    // character (ascii(substr) reads code points; the Scala kernel
    // reads UTF-8 bytes, so the replay is byte-faithful only on
    // ASCII) — so ascii(substr) reads the same bytes the kernel sees, and
    // 64-bit wraparound arithmetic is emulated in HUGEINT — products
    // of two 64-bit operands split at 2^32 so nothing exceeds int128.
    // Constants: 1000003^(7-j) mod 2^64, and the splitmix64 finalizer.
    // Docs shorter than k=8 take the kernel's Long.MaxValue sentinel.
    "q_rolling_fingerprint" -> {
      val M = "18446744073709551616"
      val C = Seq("12924618581234127435", "10923514805226455897",
        "14453212906556403763", "14003818205314896721",
        "1000009000027000027", "1000006000009", "1000003", "1")
      val gram = C.zipWithIndex.map { case (c, j) =>
        s"CAST(ascii(substr(text, p+$j, 1)) AS HUGEINT) * $c"
      }.mkString(" + ")
      s"""WITH guard AS (
         |  SELECT CASE WHEN count(*) > 0 THEN error(
         |      'q_rolling_fingerprint oracle requires a pure-ASCII corpus')
         |    ELSE 0 END AS ok
         |  FROM documents WHERE octet_length(encode(text)) <> length(text)),
         |pos AS (
         |  SELECT doc_id, lang, text, unnest(range(1, length(text) - 6)) AS p
         |  FROM documents WHERE length(text) >= 8),
         |g AS (
         |  SELECT doc_id, lang, ($gram) % $M AS h FROM pos),
         |mx AS (
         |  SELECT doc_id, lang,
         |    (h + 11400714819323198485) % $M AS z0,
         |    xor(z0, z0 >> 30) AS t1,
         |    ((t1 % 4294967296) * 13787848793156543929
         |      + (((t1 // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) % $M AS z1,
         |    xor(z1, z1 >> 27) AS t2,
         |    ((t2 % 4294967296) * 10724457036175037673
         |      + (((t2 // 4294967296) * 10724457036175037673) % 4294967296) * 4294967296) % $M AS z2,
         |    xor(z2, z2 >> 31) AS z3,
         |    -- to SIGNED before min: the Scala kernel minimizes over
         |    -- Long comparisons, where the high bit means negative
         |    CAST(CASE WHEN z3 >= 9223372036854775808 THEN z3 - $M
         |              ELSE z3 END AS BIGINT) AS z3s
         |  FROM g),
         |agg AS (
         |  SELECT doc_id, min(z3s) AS mn FROM mx GROUP BY doc_id)
         |SELECT d.doc_id, d.lang,
         |  COALESCE(a.mn, 9223372036854775807) AS fp
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |CROSS JOIN guard
         |WHERE guard.ok = 0
         |ORDER BY d.doc_id""".stripMargin
    },

    "q_sample_per_group" ->
      """SELECT lang, rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS BIGINT) AS rn
        |  FROM documents) t
        |WHERE rn <= 3
        |ORDER BY lang, rn""".stripMargin,

    "q_top_tokens" ->
      """SELECT lang, rn, token, cnt FROM (
        |  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token) AS BIGINT) AS rn
        |  FROM (SELECT lang, UNNEST(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS token
        |        FROM documents) t
        |  GROUP BY lang, token) g
        |WHERE rn <= 10
        |ORDER BY lang, rn""".stripMargin,
  )
}
