package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.sources.Tables

/** End-to-end corpus curation: score → filter → dedup → sample — the
  * composition a training-data pipeline actually runs (SURVEY.md §2.3),
  * built from the library's own combinators so each stage stays a
  * declarative plan stage.
  */
object Curation {

  /** Attach the quality score. */
  def score(df: DataFrame, textCol: Column): DataFrame =
    df.withColumn("quality", TextFunctions.qualityScore(textCol))

  /** Keep documents at or above the floor. */
  def filterQuality(df: DataFrame, minQuality: Double): DataFrame =
    df.filter(col("quality") >= minQuality)

  /** Normalized-hash dedup keeping the lowest id per group. Window over
    * the hash: high-cardinality partition key → one sort-shuffle, no
    * hot partitions. */
  def dedupKeepFirst(df: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(md5(TextFunctions.normalize(textCol))).orderBy(idCol)
    df.withColumn("__dr", row_number().over(w))
      .filter(col("__dr") === 1).drop("__dr")
  }

  /** Deterministic min-wise sample of k docs per group (same semantics
    * as the SmallestK aggregator; window form used here because the
    * frame is already small post-filter). */
  def samplePerGroup(df: DataFrame, groupCol: Column, hashCol: Column,
                     idCol: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(hashCol, idCol)
    df.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
  }

  /** Per-group quality calibration: each doc's PERCENTILE rank of its
    * quality score within its group — raw scores are not comparable
    * across sources (a 0.7 from clean wiki prose and a 0.7 from forum
    * scrape mean different things), so per-source thresholds are set
    * on the calibrated rank, not the raw score (the standard
    * per-domain curation practice). Returns q_rank ∈ [0, 1]
    * (PERCENT_RANK semantics: (rank−1)/(n−1), 0 for a singleton
    * group).
    *
    * Rank order is (floor(score·1e9), id) — the integer score image
    * makes the order replayable AND bucketable: the same two-level
    * decomposition as [[CorpusOps.lengthStratifiedSample]], with score
    * buckets from the integer image's top bits (monotone, since the
    * image is non-negative). No window ever partitions by the group
    * alone over doc rows — a source holding half the corpus still
    * spreads over 2^bucketBits tasks. */
  def calibrateQuality(docs: DataFrame, grpCol: Column, scoreCol: Column,
                       idCol: Column, bucketBits: Int = 12): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    // adds q_rank, preserves every input column (the sibling-engine
    // convention: dunder internals never leak into the output)
    val aug = docs
      .withColumn("__qi", floor(scoreCol.cast(DoubleType) * 1e9).cast(LongType))
      .withColumn("__g", grpCol)
      // scores live in [0, 1] → the integer image fits 30 bits; its
      // top bits are a monotone range bucket of the rank order
      .withColumn("__b", shiftright(col("__qi"), 30 - bucketBits))
    val cells = aug.groupBy(col("__g").as("__cg"), col("__b").as("__cb"))
      .agg(count(lit(1)).as("__c"))
    val wb = Window.partitionBy(col("__cg")).orderBy(col("__cb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy(col("__cg"))
    val cum = cells
      .withColumn("__pre", coalesce(sum(col("__c")).over(wb), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wn))
    val wj = Window.partitionBy(col("__g"), col("__b"))
      .orderBy(col("__qi"), idCol)
    aug.join(cum, col("__g") <=> col("__cg") && col("__b") === col("__cb"))
      .withColumn("__rank", col("__pre") + row_number().over(wj))
      .withColumn("q_rank",
        (col("__rank") - lit(1L)).cast(DoubleType) /
          greatest(col("__n") - lit(1L), lit(1L)).cast(DoubleType))
      .drop("__qi", "__g", "__b", "__cg", "__cb", "__c", "__pre", "__n", "__rank")
  }

  /** §2.5 — per-source calibrated quality over `documents`. */
  def calibrateQualityQ(s: SparkSession, d: String): DataFrame =
    calibrateQuality(
        score(Tables.documents(s, d), col("text"))
          .select(col("source"), col("doc_id"), col("quality")),
        col("source"), col("quality"), col("doc_id"))
      .select(col("source"), col("doc_id"), col("quality"), col("q_rank"))
      .orderBy(col("source"), col("doc_id"))

  /** Quantile normalization onto the pooled distribution (SURVEY.md
    * §2 row 215) — the batch-effect correction [[calibrateQuality]]
    * stops short of: q_rank makes scores comparable as PERCENTILES,
    * but downstream consumers that need VALUES in the original unit
    * (token budgets from harmonized lengths, thresholds in score
    * units) need each source's distribution MAPPED ONTO the pooled
    * one — the bioinformatics quantile-normalization step, applied to
    * source batches. Rule: a doc at within-source permutation rank r
    * of n_s (the (value, id) total order — row 204's convention) maps
    * to the smallest pooled value v with cum(v)·n_s ≥ r·N — the
    * lower-quantile rule, cross-multiplied so no division exists on
    * either wire. Identity contract: with a single source the mapping
    * is the identity (spec-pinned); a singleton source maps to the
    * pooled maximum (rank 1 of 1 IS its top — the honest degenerate).
    *
    * Scale shape: ranks via the row-204 construction (distinct-value
    * cumBefore per source + intra-tie window bounded by the largest
    * tie group — no global single-partition sort); the pooled
    * cumulative frame is value-domain-bounded and BROADCASTS; the
    * min-qualifying search is a broadcast non-equi join + min
    * aggregate (per row it is a binary search over the pooled
    * quantile function; the broadcast value-domain frame is the
    * operative bound at 100 TB — pre-bucket heavy-cardinality values
    * first). */
  def quantileNormalize(df: DataFrame, grpCol: Column, valCol: Column,
                        idCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(valCol.isNotNull)
      .select(grpCol.as("g"), idCol.as("id"), valCol.as("v"))
    val sv = base.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val wsv = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy(col("g"))
    val cum = sv
      .withColumn("before", coalesce(sum(col("c")).over(wsv), lit(0L)))
      .withColumn("n_s", sum(col("c")).over(wn))
      .select(col("g"), col("v"), col("before"), col("n_s"))
    val wj = Window.partitionBy(col("g"), col("v")).orderBy(col("id"))
    val ranked = base.join(cum, Seq("g", "v"))
      .withColumn("r", col("before") + row_number().over(wj).cast(LongType))
    val gcum = base.groupBy(col("v").as("gv")).agg(count(lit(1)).as("gc"))
      .withColumn("gcum", sum(col("gc")).over(
        Window.orderBy(col("gv")).rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("gv"), col("gcum"))
    val tot = base.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(tot))
      .join(broadcast(gcum),
        col("gcum") * col("n_s") >= col("r") * col("n_total"))
      .groupBy(col("g"), col("id"), col("v"), col("r"), col("n_s"))
      .agg(min(col("gv")).as("v_norm"))
      .select(col("id"), col("g"), col("v"), col("r"), col("n_s"), col("v_norm"))
  }

  /** §2 row 215 — document lengths harmonized across sources. */
  def quantileNormQ(s: SparkSession, d: String): DataFrame =
    quantileNormalize(Tables.documents(s, d), col("source"),
        col("n_chars"), col("doc_id"))
      .withColumnRenamed("id", "doc_id").withColumnRenamed("g", "source")
      .orderBy(col("doc_id"))

  /** The full pipeline over `documents`. */
  def curateQ(s: SparkSession, d: String): DataFrame = {
    val scored = score(Tables.documents(s, d), col("text"))
    val kept = filterQuality(scored, 0.55)
    val deduped = dedupKeepFirst(kept, col("text"), col("doc_id"))
    samplePerGroup(deduped, col("lang"), md5(col("text")), col("doc_id"), 3)
      .select(col("lang"), col("rn"), col("doc_id"), col("quality"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Per-domain curation report (SURVEY.md §2 row 274) — the
    * dashboard row a web-corpus curator reads per REGISTERED DOMAIN
    * (the row-232 key), deciding domain-level keeps/drops the way
    * RefinedWeb-style pipelines do (a domain whose docs are 80%
    * exact dups is a mirror farm; a single-language domain with long
    * docs is a keeper): doc count, total/mean tokens, exact-dup doc
    * share in ppm (corpus-WIDE dup check — a mirror of another
    * domain's page counts), distinct languages and the mode language
    * (deterministic count DESC, lang ASC tie-break).
    *
    * Scale shape: one corpus-wide normalized-text dup aggregation
    * (map-side combined, ids never leave their partition until the
    * count frame joins back), then domain-keyed aggregations + the
    * bounded per-domain lang window. */
  def domainReport(docs: DataFrame, urlCol: Column, textCol: Column,
                   langCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(
      coalesce(Urls.registeredDomain(Urls.hostOf(urlCol)), lit("unknown"))
        .as("domain"),
      graft.functions.TextFunctions.tokenCount(textCol).as("n_tokens"),
      lower(trim(regexp_replace(textCol, "\\s+", " "))).as("__norm"),
      langCol.as("lang"))
    val dupCounts = base.groupBy(col("__norm")).agg(count(lit(1)).as("__c"))
    val flagged = base.join(dupCounts, Seq("__norm"))
      .withColumn("__dup", (col("__c") > 1L).cast("long"))
    val tot = flagged.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("__dup")).as("n_dup_docs"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("tokens_per_doc",
        GraphOps.fdiv(col("total_tokens"), col("n_docs")))
      .withColumn("dup_ppm",
        GraphOps.fdiv(col("n_dup_docs") * 1000000L, col("n_docs")))
    val perLang = flagged.groupBy(col("domain"), col("lang"))
      .agg(count(lit(1)).as("__lc"))
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("__lc").desc, col("lang").asc)
    val topLang = perLang.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("domain"), col("lang").as("top_lang"))
    tot.join(topLang, Seq("domain"))
      .select(col("domain"), col("n_docs"), col("total_tokens"),
        col("tokens_per_doc"), col("n_dup_docs"), col("dup_ppm"),
        col("n_langs"), col("top_lang"))
  }

  /** §2 row 274 — domains seeded with the q_url_canon TLD rotation
    * (com / co.uk / github.io / unknown-TLD → 'unknown' bucket). */
  def domainReportQ(s: SparkSession, d: String): DataFrame = {
    val tld = when(pmod(col("doc_id"), lit(4)) === 0, ".com")
      .when(pmod(col("doc_id"), lit(4)) === 1, ".co.uk")
      .when(pmod(col("doc_id"), lit(4)) === 2, ".github.io")
      .otherwise(".example")
    val url = concat(lit("https://www."), lower(col("source")), tld, lit("/p"))
    domainReport(Tables.documents(s, d).withColumn("__u", url),
        col("__u"), col("text"), col("lang"))
      .orderBy(col("domain"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation"           -> (curateQ _),
    "q_quality_calibrated" -> (calibrateQualityQ _),
    "q_quantile_norm"      -> (quantileNormQ _),
    "q_domain_report"      -> (domainReportQ _),
  )

  val oracles: Map[String, String] = Map(
    // per-source (v, id) permutation ranks, the pooled inclusive
    // cumulative frame, and the cross-multiplied min-qualifying pooled
    // value; all counts BIGINT, no division on either wire
    "q_quantile_norm" ->
      """WITH base AS (
        |  SELECT source AS g, doc_id AS id, CAST(n_chars AS BIGINT) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |rk AS (
        |  SELECT g, id, v,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id) AS BIGINT) AS r,
        |    CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n_s
        |  FROM base),
        |gcum AS (
        |  SELECT v AS gv, CAST(SUM(COUNT(*)) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS gcum
        |  FROM base GROUP BY v),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM base)
        |SELECT rk.id AS doc_id, rk.g AS source, rk.v, rk.r, rk.n_s,
        |  MIN(gcum.gv) AS v_norm
        |FROM rk CROSS JOIN tot
        |JOIN gcum ON gcum.gcum * rk.n_s >= rk.r * tot.n_total
        |GROUP BY rk.id, rk.g, rk.v, rk.r, rk.n_s
        |ORDER BY doc_id""".stripMargin,

    // the oracle replays the SINGLE-window per-source percent rank over
    // the integer score image; the engine's bucketed decomposition must
    // reproduce it bit-exactly (integer rank, then one double division)
    "q_quality_calibrated" ->
      """WITH q AS (
        |  SELECT source, doc_id,
        |    0.6 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1))
        |      + 0.4 * (CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) AS quality
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, quality,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY CAST(floor(quality * 1e9) AS BIGINT), doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM q)
        |SELECT source, doc_id, quality,
        |  CAST(rk - 1 AS DOUBLE) / greatest(n - 1, 1) AS q_rank
        |FROM r
        |ORDER BY source, doc_id""".stripMargin,

    "q_curation" ->
      """WITH scored AS (
        |  SELECT doc_id, lang, text,
        |    0.6 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1))
        |      + 0.4 * (CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) AS quality
        |  FROM documents),
        |kept AS (SELECT * FROM scored WHERE quality >= 0.55),
        |dedup AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (
        |      PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |      ORDER BY doc_id) AS dr
        |    FROM kept) x
        |  WHERE dr = 1),
        |sampled AS (
        |  SELECT lang, doc_id, quality,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS BIGINT) AS rn
        |  FROM dedup)
        |SELECT lang, rn, doc_id, quality
        |FROM sampled
        |WHERE rn <= 3
        |ORDER BY lang, rn""".stripMargin,

    // same seeding; registered domain through the shared canonSql
    // fragment (concatenated, the q_url_canon precedent); mode lang
    // via ROW_NUMBER == the engine's row_number window
    "q_domain_report" ->
      ("""WITH seeded AS (
         |  SELECT doc_id, text, lang,
         |    'https://www.' || lower(source) ||
         |      (CASE WHEN doc_id % 4 = 0 THEN '.com'
         |            WHEN doc_id % 4 = 1 THEN '.co.uk'
         |            WHEN doc_id % 4 = 2 THEN '.github.io'
         |            ELSE '.example' END) || '/p' AS url
         |  FROM documents),
         |""".stripMargin
        + Urls.canonSql("seeded", Seq("doc_id")) + ",\n"
        + """base AS (
         |  SELECT COALESCE(c.registered_domain, 'unknown') AS domain,
         |    CAST(len(regexp_extract_all(s.text, '[A-Za-z0-9]+', 0)) AS BIGINT) AS n_tokens,
         |    lower(trim(regexp_replace(s.text, '\s+', ' ', 'g'))) AS norm,
         |    s.lang
         |  FROM seeded s JOIN canonized c ON s.doc_id = c.doc_id),
         |dupc AS (SELECT norm, COUNT(*) AS c FROM base GROUP BY norm),
         |fl AS (
         |  SELECT b.*, (CASE WHEN d.c > 1 THEN 1 ELSE 0 END) AS dup
         |  FROM base b JOIN dupc d ON b.norm = d.norm),
         |tot AS (
         |  SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |    CAST(SUM(dup) AS BIGINT) AS n_dup_docs,
         |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
         |  FROM fl GROUP BY domain),
         |pl AS (SELECT domain, lang, COUNT(*) AS lc FROM fl GROUP BY domain, lang),
         |top AS (
         |  SELECT domain, lang AS top_lang FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
         |      ORDER BY lc DESC, lang ASC) AS rn
         |    FROM pl) t
         |  WHERE rn = 1)
         |SELECT t.domain, t.n_docs, t.total_tokens,
         |  CAST(t.total_tokens // t.n_docs AS BIGINT) AS tokens_per_doc,
         |  t.n_dup_docs,
         |  CAST((t.n_dup_docs * 1000000) // t.n_docs AS BIGINT) AS dup_ppm,
         |  t.n_langs, p.top_lang
         |FROM tot t JOIN top p ON t.domain = p.domain
         |ORDER BY t.domain""".stripMargin),
  )
}
