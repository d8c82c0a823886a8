package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Weak-supervision labeling-function diagnostics (SURVEY.md §2 row
  * 195) — the Snorkel-style LF report (Ratner et al., VLDB 2018): a
  * curation team writes many cheap heuristic labelers (marker lists,
  * length bands, ratio gates), and before ANY label model is fit the
  * operative questions are per-LF coverage ("how often does it vote at
  * all?"), polarity balance, empirical accuracy against a small dev
  * label, and pairwise overlap/conflict ("do two LFs fire together,
  * and do they disagree when they do?" — high-conflict pairs are where
  * majority vote loses to weighted models). Votes are +1 / −1 / NULL
  * (NULL = abstain, the defining difference from a classifier); the
  * report also scores the majority-vote label itself (sign of the vote
  * sum, a zero sum abstains — the tie is genuine disagreement, not
  * evidence).
  *
  * Scale shape (100 TB): the entire report is ONE pass — a pure
  * projection computing every LF's vote, then a single map-side-
  * combined 1-row aggregate holding all per-LF, per-pair and
  * majority-vote counters (LF count is small and fixed, so the
  * aggregate width is bounded); the long-form output unstacks that one
  * row. No joins, no windows, no per-LF scans — adding an LF adds
  * columns, not passes. Dev-label rows are the same corpus rows (the
  * dev label may be NULL where unlabeled; accuracy counters simply
  * skip those).
  *
  * Output (long form, one row per LF, per unordered LF pair, and
  * 'mv'): (name, n_votes, n_pos, n_neg, n_correct, n_overlap,
  * n_conflict) — pair rows carry only the last two, vote rows only the
  * first four; NULL marks not-applicable (the kappa posture: absent
  * evidence is not a zero). */
object Weak {

  /** The report over `lfs` (name → ±1/NULL vote column) against
    * `devLabel` (±1, NULL = unlabeled). */
  def lfReport(df: DataFrame, lfs: Seq[(String, Column)], devLabel: Column): DataFrame = {
    require(lfs.nonEmpty, "need at least one labeling function")
    require(lfs.map(_._1).distinct.size == lfs.size, "LF names must be unique")
    val voted = df.select(
      (lfs.map { case (n, c) => c.cast(LongType).as(s"v_$n") } :+
        devLabel.cast(LongType).as("y")): _*)
      .withColumn("mv_sum",
        lfs.map { case (n, _) => coalesce(col(s"v_$n"), lit(0L)) }.reduce(_ + _))
    def cnt(pred: Column) = coalesce(sum(when(pred, 1L)), lit(0L))
    val perLf = lfs.flatMap { case (n, _) =>
      val v = col(s"v_$n")
      Seq(cnt(v.isNotNull).as(s"n_$n"), cnt(v === 1L).as(s"p_$n"),
        cnt(v === -1L).as(s"g_$n"), cnt(v === col("y")).as(s"c_$n"))
    }
    val pairs = for {
      i <- lfs.indices; j <- lfs.indices if i < j
    } yield (lfs(i)._1, lfs(j)._1)
    val perPair = pairs.flatMap { case (a, b) =>
      val (va, vb) = (col(s"v_$a"), col(s"v_$b"))
      Seq(cnt(va.isNotNull && vb.isNotNull).as(s"o_${a}_$b"),
        cnt(va.isNotNull && vb.isNotNull && va =!= vb).as(s"x_${a}_$b"))
    }
    val mvVote = when(col("mv_sum") > 0L, 1L)
      .when(col("mv_sum") < 0L, -1L)
    val perMv = Seq(cnt(mvVote.isNotNull).as("n_mv"), cnt(mvVote === 1L).as("p_mv"),
      cnt(mvVote === -1L).as("g_mv"), cnt(mvVote === col("y")).as("c_mv"))
    val aggCols = perLf ++ perPair ++ perMv
    val one = voted.agg(aggCols.head, aggCols.tail: _*)
    val nul = lit(null).cast(LongType)
    val rows =
      (lfs.map { case (n, _) =>
        struct(lit(s"lf_$n").as("name"), col(s"n_$n").as("n_votes"),
          col(s"p_$n").as("n_pos"), col(s"g_$n").as("n_neg"),
          col(s"c_$n").as("n_correct"), nul.as("n_overlap"), nul.as("n_conflict"))
      } ++ pairs.map { case (a, b) =>
        struct(lit(s"pair_${a}_$b").as("name"), nul.as("n_votes"), nul.as("n_pos"),
          nul.as("n_neg"), nul.as("n_correct"), col(s"o_${a}_$b").as("n_overlap"),
          col(s"x_${a}_$b").as("n_conflict"))
      } :+ struct(lit("mv").as("name"), col("n_mv").as("n_votes"),
        col("p_mv").as("n_pos"), col("g_mv").as("n_neg"),
        col("c_mv").as("n_correct"), nul.as("n_overlap"), nul.as("n_conflict")))
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** The three standing LFs of the q_lf_report workload — marker-list
    * positives, rival-language negatives, and a vowel-band heuristic —
    * all integer/regex-replayable, all abstaining by design. */
  private[operators] def standardLfs: Seq[(String, Column)] = {
    def markers(lang: String) = size(regexp_extract_all(lower(col("text")),
      lit(TextFunctions.langMarkers.toMap.apply(lang)), lit(0))).cast(LongType)
    val letters = (length(col("text")) -
      length(regexp_replace(col("text"), "[A-Za-z]", ""))).cast(LongType)
    val vowels = (length(lower(col("text"))) -
      length(regexp_replace(lower(col("text")), "[aeiou]", ""))).cast(LongType)
    Seq(
      "en" -> when(markers("en") >= 3L, 1L).when(markers("en") === 0L, -1L),
      "es" -> when(markers("es") >= 2L, -1L),
      "vw" -> when(letters > 0L,
        when(vowels * 10L >= letters * 3L && vowels * 10L <= letters * 5L, 1L)
          .otherwise(-1L)))
  }

  /** §2 row 195 — the standing LFs against the lang == 'en' dev label. */
  def lfReportQ(s: SparkSession, d: String): DataFrame =
    lfReport(Tables.documents(s, d), standardLfs,
        when(col("lang") === "en", 1L).otherwise(-1L))
      .orderBy(col("name"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lf_report" -> (lfReportQ _))

  val oracles: Map[String, String] = Map(
    // the same vote CASEs, one agg CTE holding every counter, unstacked
    // by a 7-arm UNION ALL; HUGEINT counters → BIGINT on every wire
    "q_lf_report" -> {
      val en = TextFunctions.langMarkers.toMap.apply("en")
      val es = TextFunctions.langMarkers.toMap.apply("es")
      val lfNames = Seq("en", "es", "vw")
      val pairNames = Seq("en" -> "es", "en" -> "vw", "es" -> "vw")
      val lfCounters = lfNames.map { n =>
        s"CAST(COALESCE(SUM(CASE WHEN v_$n IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_$n,\n" +
          s"    CAST(COALESCE(SUM(CASE WHEN v_$n = 1 THEN 1 END), 0) AS BIGINT) AS p_$n,\n" +
          s"    CAST(COALESCE(SUM(CASE WHEN v_$n = -1 THEN 1 END), 0) AS BIGINT) AS g_$n,\n" +
          s"    CAST(COALESCE(SUM(CASE WHEN v_$n = y THEN 1 END), 0) AS BIGINT) AS c_$n"
      }.mkString(",\n    ")
      val pairCounters = pairNames.map { case (x, z) =>
        s"CAST(COALESCE(SUM(CASE WHEN v_$x IS NOT NULL AND v_$z IS NOT NULL THEN 1 END), 0) AS BIGINT) AS o_${x}_$z,\n" +
          s"    CAST(COALESCE(SUM(CASE WHEN v_$x IS NOT NULL AND v_$z IS NOT NULL AND v_$x <> v_$z THEN 1 END), 0) AS BIGINT) AS x_${x}_$z"
      }.mkString(",\n    ")
      val lfArms = lfNames.map(n =>
        s"  SELECT 'lf_$n' AS name, n_$n AS n_votes, p_$n AS n_pos, g_$n AS n_neg, c_$n AS n_correct, CAST(NULL AS BIGINT) AS n_overlap, CAST(NULL AS BIGINT) AS n_conflict FROM a")
        .mkString("\n  UNION ALL\n")
      val pairArms = pairNames.map { case (x, z) =>
        s"  SELECT 'pair_${x}_$z', NULL, NULL, NULL, NULL, o_${x}_$z, x_${x}_$z FROM a"
      }.mkString("\n  UNION ALL\n")
      s"""WITH v AS (
         |  SELECT
         |    CASE WHEN len(regexp_extract_all(lower(text), '$en')) >= 3 THEN 1
         |         WHEN len(regexp_extract_all(lower(text), '$en')) = 0 THEN -1 END AS v_en,
         |    CASE WHEN len(regexp_extract_all(lower(text), '$es')) >= 2 THEN -1 END AS v_es,
         |    CASE WHEN length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) > 0 THEN
         |      CASE WHEN (length(lower(text)) - length(regexp_replace(lower(text), '[aeiou]', '', 'g'))) * 10
         |                  >= (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 3
         |             AND (length(lower(text)) - length(regexp_replace(lower(text), '[aeiou]', '', 'g'))) * 10
         |                  <= (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 5
         |           THEN 1 ELSE -1 END END AS v_vw,
         |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
         |  FROM documents),
         |v2 AS (
         |  SELECT *, COALESCE(v_en, 0) + COALESCE(v_es, 0) + COALESCE(v_vw, 0) AS ms
         |  FROM v),
         |a AS (
         |  SELECT
         |    $lfCounters,
         |    $pairCounters,
         |    CAST(COALESCE(SUM(CASE WHEN ms <> 0 THEN 1 END), 0) AS BIGINT) AS n_mv,
         |    CAST(COALESCE(SUM(CASE WHEN ms > 0 THEN 1 END), 0) AS BIGINT) AS p_mv,
         |    CAST(COALESCE(SUM(CASE WHEN ms < 0 THEN 1 END), 0) AS BIGINT) AS g_mv,
         |    CAST(COALESCE(SUM(CASE WHEN (CASE WHEN ms > 0 THEN 1 WHEN ms < 0 THEN -1 END) = y THEN 1 END), 0) AS BIGINT) AS c_mv
         |  FROM v2)
         |SELECT name, n_votes, n_pos, n_neg, n_correct, n_overlap, n_conflict FROM (
         |$lfArms
         |  UNION ALL
         |$pairArms
         |  UNION ALL
         |  SELECT 'mv', n_mv, p_mv, g_mv, c_mv, NULL, NULL FROM a) _out
         |ORDER BY name""".stripMargin
    })
}
