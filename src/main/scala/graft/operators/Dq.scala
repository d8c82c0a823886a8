package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** A row-level data-quality rule: `pred` TRUE means the row passes.
  * FALSE **or NULL** is a violation — a row that cannot be *proven*
  * valid is quarantined (the SQL three-valued-logic trap where
  * `WHERE NOT pred` silently keeps NULL rows is exactly what this
  * type exists to close). Names must be unique per rule set; the
  * declaration order is the reporting order. */
final case class DqRule(name: String, pred: Column)

/** Row-level data-quality gate with quarantine (SURVEY.md §2 row 150).
  *
  * The reference validates by HARD ERROR: an unexpected column or an
  * unparseable day aborts the whole load (transform.py:17-153's
  * schema/day checks, reference file:line cited in SURVEY §1). That
  * posture is correct for schema drift but wrong for row-level dirt at
  * 100 TB — one bad row among 10^11 must not kill a 6-hour job, and
  * silently dropping it is worse. The gate generalizes the
  * reference's checks to per-row rules with an explicit QUARANTINE
  * channel: every input row lands in exactly one of clean/quarantine,
  * and quarantined rows carry WHICH rules they failed (provenance for
  * repair jobs), never just a boolean.
  *
  * Scale shape:
  *  - [[tag]] is ONE pure projection — an array of codegen'd
  *    `when(NOT coalesce(pred,false), name)` branches compacted to the
  *    violation list. No shuffle, no UDF; whole-stage codegen keeps it
  *    inside the scan stage, and filters above the tag still push past
  *    it to parquet (the predicates reference only input columns).
  *  - [[split]] is two filters over the tagged frame: at scale both
  *    sinks should be written in ONE pass instead — [[writeGated]]
  *    partitions the single tagged frame by the boolean `dq_ok`, so
  *    clean and quarantine land as sibling partition directories in
  *    one job (no second scan, no persist needed).
  *  - [[summary]] is ONE map-side-combined aggregation (a count plus
  *    one conditional sum per rule — a fixed-width partial at any
  *    corpus size) unpivoted driver-free by exploding a rules-bounded
  *    struct array. No per-rule pass, no explode of row-sized data.
  *  - Referential rules (key must exist in a dimension) are a LEFT
  *    JOIN against the broadcast dim marked with a flag column
  *    ([[withRefFlag]]), then an ordinary `flag IS NOT NULL` rule:
  *    the dim ships once per executor and the fact never shuffles.
  */
object Dq {

  /** Violation indicator: TRUE iff the rule is failed or unprovable. */
  private def viol(r: DqRule): Column = !coalesce(r.pred, lit(false))

  private def requireRules(rules: Seq[DqRule]): Unit = {
    require(rules.nonEmpty, "empty rule set")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_.name)}")
  }

  /** Tag every row with `dq_violations: array<string>` (failed rule
    * names in declaration order; empty = clean) and `dq_ok: boolean`.
    * One projection; input columns untouched. */
  def tag(df: DataFrame, rules: Seq[DqRule]): DataFrame = {
    requireRules(rules)
    df.withColumn("dq_violations",
        array_compact(array(rules.map(r => when(viol(r), lit(r.name))): _*)))
      .withColumn("dq_ok", size(col("dq_violations")) === 0)
  }

  /** (clean, quarantine): clean rows with the gate columns dropped,
    * quarantine rows with provenance kept. Disjoint, exhaustive. */
  def split(df: DataFrame, rules: Seq[DqRule]): (DataFrame, DataFrame) = {
    val t = tag(df, rules)
    (t.filter(col("dq_ok")).drop("dq_violations", "dq_ok"),
      t.filter(!col("dq_ok")).drop("dq_ok"))
  }

  /** One-job dual sink: the tagged frame written `partitionBy(dq_ok)`,
    * so `path/dq_ok=true` is the clean set and `path/dq_ok=false` the
    * quarantine — one scan, one write, and a reader of either side
    * gets partition pruning for free. The flag is written as its
    * string form ('true'/'false'): partition-column type inference
    * reads it back as string anyway, so pinning the type keeps the
    * round-trip deterministic instead of inference-dependent. */
  def writeGated(df: DataFrame, rules: Seq[DqRule], path: String): Unit =
    tag(df, rules)
      .withColumn("dq_violations", array_join(col("dq_violations"), ","))
      .withColumn("dq_ok", col("dq_ok").cast("string"))
      .write.mode("overwrite").partitionBy("dq_ok").parquet(path)

  /** Per-rule violation counts over the whole input: (rule, n_rows,
    * n_viol, viol_pct) in rule declaration order. ONE aggregation —
    * the partial is (count, one sum per rule), constant-width. */
  def summary(df: DataFrame, rules: Seq[DqRule]): DataFrame = {
    requireRules(rules)
    val aggd = df.agg(
      count(lit(1)).as("n_rows"),
      rules.map(r => sum(viol(r).cast("long")).as(s"__v_${r.name}")): _*)
    aggd.select(col("n_rows"),
        explode(array(rules.zipWithIndex.map { case (r, i) =>
          struct(lit(i).as("ord"), lit(r.name).as("rule"),
            col(s"__v_${r.name}").as("n_viol"))
        }: _*)).as("s"))
      .select(col("s.ord").as("ord"), col("s.rule").as("rule"),
        col("n_rows"), col("s.n_viol").as("n_viol"),
        GraphOps.fdiv(lit(100L) * col("s.n_viol"), col("n_rows")).as("viol_pct"))
  }

  /** Mark rows of `df` whose `keyCol` exists in `dim.dimKey` with a
    * non-null `flagName` column (broadcast left join — the dim must be
    * dimension-sized). The matching rule is then
    * `DqRule(name, col(flagName).isNotNull)`. */
  def withRefFlag(df: DataFrame, keyCol: String,
                  dim: DataFrame, dimKey: String, flagName: String): DataFrame =
    df.join(
      broadcast(dim.select(col(dimKey).as(keyCol)).distinct()
        .withColumn(flagName, lit(true))),
      Seq(keyCol), "left")

  // ---------------------------------------------------------------- //
  // registered queries — documents gated by a 4-rule policy: length,
  // allowed-language list, internal consistency, and a referential
  // allowed-sources dim (src0..src15, so src16-19 quarantine).
  // ---------------------------------------------------------------- //

  private val AllowedLangs   = Seq("en", "de", "fr", "es")
  private val AllowedSources = (0 to 15).map(i => s"src$i")

  private def docRules: Seq[DqRule] = Seq(
    DqRule("r_min_len",        col("n_chars") >= 100L),
    DqRule("r_lang_allowed",   col("lang").isin(AllowedLangs: _*)),
    DqRule("r_len_consistent", col("n_chars") === length(col("text")).cast("long")),
    DqRule("r_source_known",   col("__src_ok").isNotNull))

  private def gatedDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = AllowedSources.toDF("allowed_source")
    withRefFlag(Tables.documents(s, dir), "source", dim, "allowed_source", "__src_ok")
  }

  /** §2 row 150 — the quarantine channel: per-row failed-rule list. */
  def quarantineQ(s: SparkSession, dir: String): DataFrame =
    tag(gatedDocs(s, dir), docRules)
      .filter(!col("dq_ok"))
      .select(col("doc_id"),
        array_join(col("dq_violations"), ",").as("violations"))
      .orderBy(col("doc_id"))

  /** §2 row 150 — the per-rule violation report. */
  def summaryQ(s: SparkSession, dir: String): DataFrame =
    summary(gatedDocs(s, dir), docRules)
      .orderBy(col("ord"))
      .select(col("rule"), col("n_rows"), col("n_viol"), col("viol_pct"))

  // ---- Benford first-digit audit (SURVEY.md §2 row 203) -------------------

  /** log10(1 + 1/d) · 1e6, d = 1..9 — the Benford proportions as
    * FIXED integer parts-per-million literals (they sum to exactly
    * 1_000_000), the dcgWeights pattern: transcendentals enter both
    * engines as the same constants, never as computed doubles. */
  private[graft] val BenfordPpm: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  /** Benford first-digit audit — the synthetic-data / fraud detector
    * for naturally-grown numeric columns (sizes, amounts, counts that
    * span orders of magnitude follow log10(1+1/d); fabricated or
    * template-generated values don't — Benford's law is standard
    * forensic-accounting and data-plausibility tooling). Per digit
    * 1-9: observed count, observed ppm (exact floor division),
    * expected Benford ppm, and the signed deviation numerator
    * n_d·1e6 − N·ppm_d (positive = over-represented; zero-sum across
    * digits by construction). The leading digit comes from the
    * integer's STRING head — exact in both engines (BIGINT never
    * prints scientific notation); values ≤ 0 carry no leading digit
    * and are excluded by contract. Digits with zero observations
    * still report (the absence IS the finding). OVERFLOW: N < 9.2e12.
    *
    * Scale shape: one pure projection + one map-side-combined 9-key
    * groupBy, joined to a 9-row literal frame — no windows, no sort
    * beyond the 9-row output. */
  def benfordAudit(df: DataFrame, valCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bf = BenfordPpm.zipWithIndex
      .map { case (p, i) => (i.toLong + 1L, p) }.toDF("digit", "benford_ppm")
    val obs = df.filter(valCol.isNotNull && valCol > 0)
      .select(substring(valCol.cast(org.apache.spark.sql.types.LongType)
        .cast(org.apache.spark.sql.types.StringType), 1, 1)
        .cast(org.apache.spark.sql.types.LongType).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = obs.agg(coalesce(sum(col("n_obs")), lit(0L)).as("n_total"))
    broadcast(bf).join(obs, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        GraphOps.fdiv(coalesce(col("n_obs"), lit(0L)) * 1000000L,
          greatest(col("n_total"), lit(1L))).as("obs_ppm"),
        col("benford_ppm"),
        (coalesce(col("n_obs"), lit(0L)) * 1000000L -
          col("n_total") * col("benford_ppm")).as("dev_num"),
        col("n_total"))
  }

  /** §2 row 203 — Benford audit of the lineitem extended price (cast
    * to whole currency units; a price×quantity product is the classic
    * Benford-distributed population). */
  def benfordQ(s: SparkSession, dir: String): DataFrame =
    benfordAudit(Tables.lineitem(s, dir),
        floor(col("l_extendedprice")).cast(org.apache.spark.sql.types.LongType))
      .orderBy(col("digit"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_quarantine" -> (quarantineQ _),
    "q_dq_summary"    -> (summaryQ _),
    "q_benford"       -> (benfordQ _))

  private def langList   = AllowedLangs.map(l => s"'$l'").mkString(", ")
  private def sourceList = AllowedSources.map(s => s"'$s'").mkString(", ")

  /** The rules as (name, SQL violation condition) — generated from the
    * SAME Scala constants the Spark side uses (the Blocklist advisory
    * fix pattern: policy edits cannot silently de-sync the oracle).
    * The referential rule replays the flag join as an IN-list, exactly
    * equivalent because the dim IS the literal list. */
  private def sqlViol: Seq[(String, String)] = Seq(
    "r_min_len"        -> "n_chars >= 100",
    "r_lang_allowed"   -> s"lang IN ($langList)",
    "r_len_consistent" -> "n_chars = length(text)",
    "r_source_known"   -> s"source IN ($sourceList)",
  ).map { case (n, pred) => n -> s"NOT COALESCE($pred, FALSE)" }

  val oracles: Map[String, String] = Map(
    // the same floor-cast leading-digit string head, the shared ppm
    // literals (generated from BenfordPpm — policy edits cannot
    // de-sync the oracle), nonneg floor division, LEFT join so zero
    // digits still report; HUGEINT → BIGINT
    "q_benford" -> {
      val bfRows = BenfordPpm.zipWithIndex
        .map { case (p, i) => s"(CAST(${i + 1} AS BIGINT), CAST($p AS BIGINT))" }
        .mkString(", ")
      s"""WITH v AS (
         |  SELECT CAST(FLOOR(l_extendedprice) AS BIGINT) AS x FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL
         |    AND CAST(FLOOR(l_extendedprice) AS BIGINT) > 0),
         |obs AS (
         |  SELECT CAST(substr(CAST(x AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |    CAST(COUNT(*) AS BIGINT) AS n_obs
         |  FROM v GROUP BY 1),
         |tot AS (SELECT CAST(COALESCE(SUM(n_obs), 0) AS BIGINT) AS n_total FROM obs),
         |bf(digit, benford_ppm) AS (VALUES $bfRows)
         |SELECT bf.digit, COALESCE(obs.n_obs, 0) AS n_obs,
         |  CAST(COALESCE(obs.n_obs, 0) * 1000000 // greatest(tot.n_total, 1) AS BIGINT) AS obs_ppm,
         |  bf.benford_ppm,
         |  CAST(COALESCE(obs.n_obs, 0) * 1000000 - tot.n_total * bf.benford_ppm AS BIGINT) AS dev_num,
         |  tot.n_total
         |FROM bf LEFT JOIN obs ON bf.digit = obs.digit CROSS JOIN tot
         |ORDER BY bf.digit""".stripMargin
    },

    "q_dq_quarantine" ->
      s"""WITH flg AS (
         |  SELECT doc_id, concat_ws(',',
         |${sqlViol.map { case (n, v) => s"    CASE WHEN $v THEN '$n' END" }.mkString(",\n")}
         |  ) AS violations
         |  FROM documents)
         |SELECT doc_id, violations FROM flg
         |WHERE violations <> ''
         |ORDER BY doc_id""".stripMargin,

    "q_dq_summary" ->
      s"""WITH t AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |${sqlViol.map { case (n, v) =>
             s"    CAST(SUM(CASE WHEN $v THEN 1 ELSE 0 END) AS BIGINT) AS v_$n" }
           .mkString(",\n")}
         |  FROM documents)
         |SELECT rule, n_rows, n_viol,
         |  CAST((100 * n_viol) // n_rows AS BIGINT) AS viol_pct
         |FROM (
         |${sqlViol.zipWithIndex.map { case ((n, _), i) =>
             s"  SELECT $i AS ord, '$n' AS rule, n_rows, v_$n AS n_viol FROM t" }
           .mkString("\n  UNION ALL\n")}
         |) u
         |ORDER BY ord""".stripMargin,
  )
}
