package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.sources.Tables

/** N-gram overlap scoring between candidate and reference texts
  * (SURVEY.md §2 row 276) — the BLEU/ROUGE-family eval a generation
  * or augmentation pipeline grades itself with (BLEU-n = clipped
  * precision, ROUGE-n = recall; Papineni et al. 2002 / Lin 2004),
  * and the row-73 decontamination family's GRADED complement: not
  * "does the candidate contain a verbatim eval shingle?" but "how
  * MUCH of the reference does it reproduce?".
  *
  * Exact integer core per (doc, n): n_clip = Σ_g min(count_cand(g),
  * count_ref(g)) — the BLEU clipping rule, so a candidate repeating
  * one reference word cannot farm precision — plus total gram counts
  * both sides; precision = clip/cand, recall = clip/ref and F1 =
  * 2·clip/(cand+ref) are the pinned display doubles (F1 simplifies
  * to that rational because P and R share the numerator). Empty
  * sides → NULL metrics (the kappa posture).
  *
  * Scale shape: per-n, two map-side-combined (doc, gram) count
  * aggregations and one co-partitioned inner join — gram rows never
  * leave their doc key, no window, no cross join; the per-doc gram
  * frame is document-bounded. */
object OverlapEval {

  // NULL text counts as an empty side (0 grams -> NULL precision/
  // recall), not legacy size(NULL) = -1 denominators.
  private def words(c: Column): Column =
    graft.functions.TextFunctions.wsTokens(c)

  /** The token n-gram array (space-joined); [] when the text is
    * shorter than n. The sequence guard matters: Spark's
    * sequence(1, 0) DESCENDS instead of emitting empty. */
  private def grams(c: Column, n: Int): Column = {
    val ws = words(c)
    if (n == 1) ws
    else when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*)))
      .otherwise(array())
  }

  def ngramF1(pairs: DataFrame, idCol: String, candCol: String,
              refCol: String, ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"gram sizes must be >= 1: $ns")
    val counts = ns.map { n =>
      val base = pairs.select(col(idCol).as("doc_id"),
        grams(col(candCol), n).as("cg"), grams(col(refCol), n).as("rg"))
      val cc = base.select(col("doc_id"), explode(col("cg")).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      val rc = base.select(col("doc_id"), explode(col("rg")).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("r"))
      val clip = cc.join(rc, Seq("doc_id", "g"))
        .groupBy(col("doc_id"))
        .agg(sum(least(col("c"), col("r"))).as("n_clip"))
      base.select(col("doc_id"), size(col("cg")).cast(LongType).as("n_cand"),
          size(col("rg")).cast(LongType).as("n_ref"))
        .join(clip, Seq("doc_id"), "left")
        .select(col("doc_id"), lit(n.toLong).as("n"),
          coalesce(col("n_clip"), lit(0L)).as("n_clip"),
          col("n_cand"), col("n_ref"))
    }.reduce(_ unionByName _)
    counts
      .withColumn("precision", when(col("n_cand") === 0L, lit(null))
        .otherwise(col("n_clip").cast(DoubleType) / col("n_cand").cast(DoubleType)))
      .withColumn("recall", when(col("n_ref") === 0L, lit(null))
        .otherwise(col("n_clip").cast(DoubleType) / col("n_ref").cast(DoubleType)))
      .withColumn("f1", when(col("n_cand") + col("n_ref") === 0L, lit(null))
        .otherwise((col("n_clip") * 2L).cast(DoubleType) /
          (col("n_cand") + col("n_ref")).cast(DoubleType)))
  }

  /** §2 row 276 — candidates derived from the references by a
    * deterministic word-level corruption (every 5th word dropped,
    * every 7th survivor doubled — the doubling makes the clipping
    * rule bite), scored at n = 1 and 2. */
  def ngramF1Q(s: SparkSession, d: String): DataFrame = {
    val ws = words(col("text"))
    val surv = filter(
      transform(ws, (w, i) => when(pmod(i, lit(5)) =!= 4, w)),
      w => w.isNotNull)
    val cand = array_join(
      flatten(transform(surv, (w, i) =>
        when(pmod(i, lit(7)) === 0, array(w, w)).otherwise(array(w)))), " ")
    ngramF1(Tables.documents(s, d).select(col("doc_id"),
        cand.as("cand"), col("text").as("ref")),
      "doc_id", "cand", "ref", ns = Seq(1, 2))
      .orderBy(col("doc_id"), col("n"))
  }

  /** pass@k — the unbiased estimator over n samples with c passes
    * (SURVEY.md §2 row 285; Chen et al. 2021, the HumanEval metric):
    * pass@k = 1 − C(n−c, k)/C(n, k) = 1 − Π_{i<k} (n−c−i)/(n−i),
    * THE eval number a code/agent training pipeline reports per task.
    * Exact rational image: pass_num = den − Π max(n−c−i, 0) and
    * pass_den = Π (n−i), both BIGINT products of k factors (the
    * max(·, 0) clamp makes c > n−k collapse the numerator product to
    * 0 ⇒ pass@k = 1 exactly); pass_ppm floors the ratio. Tasks with
    * n < k emit NULLs — the estimator is undefined, not 0.
    *
    * Scale shape: ONE map-side-combined (task → n, c) aggregation;
    * the k-factor products are per-row `aggregate` folds over a
    * k-length sequence — no window, no join, cost O(tasks·k).
    * OVERFLOW CONTRACT: Π_{i<k}(n−i) < 2^63 — at n ≤ 64 any k ≤ 10
    * is safe; cap samples per task upstream (fixed n per task is the
    * metric's own design). */
  def passAtK(samples: DataFrame, taskCol: Column, passedCol: Column,
              ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"k values must be >= 1: $ks")
    val counts = samples.groupBy(taskCol.as("task_id"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(passedCol, 1L).otherwise(0L)), lit(0L)).as("c"))
    ks.map { k =>
      val miss = aggregate(sequence(lit(0L), lit(k - 1L)), lit(1L),
        (acc, i) => acc * greatest(col("n") - col("c") - i, lit(0L)))
      val den = aggregate(sequence(lit(0L), lit(k - 1L)), lit(1L),
        (acc, i) => acc * (col("n") - i))
      counts.select(col("task_id"), lit(k.toLong).as("k"), col("n"), col("c"),
        when(col("n") < k, lit(null)).otherwise(den - miss).as("pass_num"),
        when(col("n") < k, lit(null)).otherwise(den).as("pass_den"))
        .withColumn("pass_ppm", when(col("pass_den").isNull, lit(null))
          .otherwise(graft.operators.GraphOps.fdiv(
            col("pass_num") * 1000000L, col("pass_den"))))
    }.reduce(_ unionByName _)
  }

  /** §2 row 285 — pass@{1,4} over a seeded sample table: tasks are
    * doc_id mod 97, at most 16 samples per task (the metric's fixed-n
    * design; row_number over the task keeps the cut deterministic),
    * passed = a mod-3 cut over (doc_id + n_chars) so c varies across
    * tasks and both saturation edges (c = 0, c = n) are populated. */
  def passAtKQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, d)
      .select(pmod(col("doc_id"), lit(97)).as("task_id"), col("doc_id"),
        (pmod(col("doc_id") + col("n_chars"), lit(3)) === 0).as("passed"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("task_id")).orderBy(col("doc_id"))))
      .filter(col("__rn") <= 16)
    passAtK(base, col("task_id"), col("passed"), ks = Seq(1, 4))
      .orderBy(col("task_id"), col("k"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ngram_f1" -> (ngramF1Q _),
    "q_pass_at_k" -> (passAtKQ _))

  val oracles: Map[String, String] = Map(
    // the same k-factor products via list_reduce (BIGINT-exact —
    // DuckDB's product() aggregate is DOUBLE and would not replay);
    // range(0, k) is k-exclusive like the engine's sequence(0, k-1)
    "q_pass_at_k" ->
      """WITH s AS (
        |  SELECT doc_id % 97 AS task_id, doc_id,
        |    (doc_id + n_chars) % 3 = 0 AS passed,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id % 97 ORDER BY doc_id) AS rn
        |  FROM documents),
        |t AS (
        |  SELECT task_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM s WHERE rn <= 16 GROUP BY task_id),
        |ks(k) AS (VALUES (CAST(1 AS BIGINT)), (CAST(4 AS BIGINT))),
        |p AS (
        |  SELECT task_id, k, n, c,
        |    list_reduce(list_transform(range(0, k), i -> n - i),
        |      (a, b) -> a * b) AS den,
        |    list_reduce(list_transform(range(0, k),
        |        i -> GREATEST(n - c - i, CAST(0 AS BIGINT))),
        |      (a, b) -> a * b) AS miss
        |  FROM t CROSS JOIN ks)
        |SELECT task_id, k, n, c,
        |  CASE WHEN n < k THEN NULL ELSE den - miss END AS pass_num,
        |  CASE WHEN n < k THEN NULL ELSE den END AS pass_den,
        |  CASE WHEN n < k THEN NULL
        |       ELSE ((den - miss) * 1000000) // den END AS pass_ppm
        |FROM p
        |ORDER BY task_id, k""".stripMargin,

    // same corruption via range indexing (DuckDB range(a, b) is
    // b-EXCLUSIVE; list indexing 1-based), same clipped-count join
    "q_ngram_f1" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |sv AS (
        |  SELECT doc_id, ws,
        |    list_transform(list_filter(range(1, len(ws) + 1), i -> (i - 1) % 5 <> 4),
        |      i -> ws[i]) AS surv
        |  FROM w),
        |cn AS (
        |  SELECT doc_id, ws AS ref_ws,
        |    flatten(list_transform(range(1, len(surv) + 1),
        |      i -> CASE WHEN (i - 1) % 7 = 0 THEN [surv[i], surv[i]]
        |                ELSE [surv[i]] END)) AS cand_ws
        |  FROM sv),
        |gr AS (
        |  SELECT doc_id, 1 AS n, cand_ws AS cg, ref_ws AS rg FROM cn
        |  UNION ALL
        |  SELECT doc_id, 2 AS n,
        |    list_transform(range(1, greatest(len(cand_ws) - 1, 0) + 1),
        |      i -> cand_ws[i] || ' ' || cand_ws[i + 1]),
        |    list_transform(range(1, greatest(len(ref_ws) - 1, 0) + 1),
        |      i -> ref_ws[i] || ' ' || ref_ws[i + 1])
        |  FROM cn),
        |cc AS (
        |  SELECT doc_id, n, unnest(cg) AS g FROM gr),
        |ccn AS (SELECT doc_id, n, g, COUNT(*) AS c FROM cc GROUP BY 1, 2, 3),
        |rr AS (
        |  SELECT doc_id, n, unnest(rg) AS g FROM gr),
        |rrn AS (SELECT doc_id, n, g, COUNT(*) AS r FROM rr GROUP BY 1, 2, 3),
        |clip AS (
        |  SELECT c.doc_id, c.n, SUM(LEAST(c.c, r.r)) AS n_clip
        |  FROM ccn c JOIN rrn r ON c.doc_id = r.doc_id AND c.n = r.n AND c.g = r.g
        |  GROUP BY c.doc_id, c.n),
        |tot AS (
        |  SELECT doc_id, n, CAST(len(cg) AS BIGINT) AS n_cand,
        |    CAST(len(rg) AS BIGINT) AS n_ref
        |  FROM gr)
        |SELECT t.doc_id, CAST(t.n AS BIGINT) AS n,
        |  CAST(COALESCE(cl.n_clip, 0) AS BIGINT) AS n_clip,
        |  t.n_cand, t.n_ref,
        |  CASE WHEN t.n_cand = 0 THEN NULL
        |       ELSE CAST(COALESCE(cl.n_clip, 0) AS DOUBLE) / CAST(t.n_cand AS DOUBLE) END AS precision,
        |  CASE WHEN t.n_ref = 0 THEN NULL
        |       ELSE CAST(COALESCE(cl.n_clip, 0) AS DOUBLE) / CAST(t.n_ref AS DOUBLE) END AS recall,
        |  CASE WHEN t.n_cand + t.n_ref = 0 THEN NULL
        |       ELSE CAST(COALESCE(cl.n_clip, 0) * 2 AS DOUBLE) / CAST(t.n_cand + t.n_ref AS DOUBLE) END AS f1
        |FROM tot t LEFT JOIN clip cl ON t.doc_id = cl.doc_id AND t.n = cl.n
        |ORDER BY t.doc_id, t.n""".stripMargin)
}
