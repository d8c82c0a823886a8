package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Distributed batch-perceptron classifier (SURVEY.md §2 row 138) —
  * the TRAINING primitive behind curation-style quality classifiers
  * (GPT-3/LLaMA-lineage pipelines train a lightweight classifier on
  * weak labels and keep what it scores well; the serving half is a
  * per-row projection this file also provides). Batch perceptron, not
  * SGD: the update is the SUM of misclassified examples' y·x — one
  * map-side-combined aggregation per iteration, order-independent,
  * which is what makes distributed training DETERMINISTIC (per-sample
  * SGD depends on visit order by construction; float gradient sums
  * depend on partitioning — this does neither).
  *
  * Scale shape (100 TB): the model is d+1 longs on the driver (the
  * bounded-model posture of [[IvfIndex]]/[[ClusterOps]]); each
  * iteration is ONE pass — the dot product against weight LITERALS is
  * a pure projection, the update a d-column aggregate. Scoring is a
  * zero-shuffle projection.
  *
  * Determinism/oracle: integer features, integer labels (±1), integer
  * weights — every iteration replays exactly in DuckDB (unrolled
  * CTEs). Ties score negative (`dot > 0` → +1 else −1) and update on
  * `y·dot <= 0`, both engines identical.
  *
  * OVERFLOW CONTRACT: |w_j| grows at most by Σ|x_j| per iteration, so
  * iters · Σ_docs |x_j| · max_j |x_j| · d must stay under 2^63 —
  * with character-count features (≤ ~1e4) that holds to ~1e12 docs at
  * iters ≲ 10; heavier feature scales should be pre-divided (the
  * decision rule is invariant to uniform feature scaling only at
  * train+serve jointly — document any rescale with the model). */
object Classify {

  /** Integer character-statistics features over a text column —
    * bias, length, digit count, vowel count, space count. Cheap,
    * codegen'd, and byte-replayable in DuckDB (`length −
    * length(regexp_replace(...))`, the charClassRatio derivation). */
  def charFeatures(textCol: Column): Seq[Column] = {
    def cnt(c: Column, cls: String) =
      (length(c) - length(regexp_replace(c, cls, ""))).cast(LongType)
    Seq(
      lit(1L),
      length(textCol).cast(LongType),
      cnt(textCol, "[0-9]"),
      cnt(lower(textCol), "[aeiou]"),
      cnt(textCol, "[ ]"))
  }

  /** The four registered queries share one expensive input shape: the
    * regex character counts over `text`. Un-materialized, EVERY
    * training iteration (plus the scoring pass, plus rocAuc/gains'
    * quantile probe) re-runs 3 regexp_replace passes over the full
    * corpus text — 5+ full regex scans per query for a frame that is
    * just 5 longs + a label per doc. Materialize it ONCE (guide §1.2
    * step 1: don't recompute what you throw away): training, scoring
    * and eval then ride the narrow integer frame, and the text column
    * is scanned exactly once per query. Values are identical —
    * features are deterministic integers either way. Persist, not
    * checkpoint: lineage survives lost blocks; the bench/verify
    * harnesses clear the cache per query (the labelPropagation
    * call-lifetime-cache posture). */
  private def featureFrame(docs: DataFrame): DataFrame =
    docs.select(charFeatures(col("text")).zipWithIndex
        .map { case (f, i) => f.as(s"x$i") } :+
        when(col("lang") === "en", 1L).otherwise(-1L).as("y"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private val featCols: Seq[Column] = (0 until 5).map(i => col(s"x$i"))

  /** `iters` batch-perceptron rounds from zero weights; returns the
    * weight vector (same order as `feats`). `labelCol` must be ±1. */
  def trainPerceptron(df: DataFrame, feats: Seq[Column], labelCol: Column,
                      iters: Int): Seq[Long] = {
    require(feats.nonEmpty && iters >= 1, "need features and iters >= 1")
    val y = labelCol.cast(LongType)
    (1 to iters).foldLeft(Seq.fill(feats.size)(0L)) { (w, _) =>
      val dot = feats.zip(w).map { case (f, wi) => f * lit(wi) }
        .reduce(_ + _)
      val mis = (y * dot) <= 0
      val aggs = feats.map(f => coalesce(sum(when(mis, y * f)), lit(0L)))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      w.zipWithIndex.map { case (wi, j) => wi + row.getLong(j) }
    }
  }

  /** ±1 prediction — a pure projection against weight literals. */
  def predict(feats: Seq[Column], w: Seq[Long]): Column = {
    val dot = feats.zip(w).map { case (f, wi) => f * lit(wi) }.reduce(_ + _)
    when(dot > 0, 1L).otherwise(-1L)
  }

  /** §2 row 118 — 3 rounds on char features, label = (lang == 'en');
    * output: the learned weights + the residual misclassified count
    * as (name, value) rows. */
  def perceptronQ(s: SparkSession, d: String): DataFrame = {
    val s2 = s; import s2.implicits._
    val ff = featureFrame(Tables.documents(s, d))
    val w = trainPerceptron(ff, featCols, col("y"), iters = 3)
    val mis = ff.agg(coalesce(sum(
        when(col("y") =!= predict(featCols, w), 1L)), lit(0L)).as("value"))
      .select(lit("misclassified").as("name"), col("value"))
    w.zipWithIndex.map { case (wi, j) => (s"w$j", wi) }
      .toDF("name", "value")
      .unionByName(mis)
      .orderBy(col("name"))
  }

  /** Classifier calibration table (SURVEY.md §2 row 181) — the
    * reliability diagram's exact integer core: bin the model's raw
    * margin into `bins` equal-width buckets over its observed range
    * and report (n, n_pos, lo, hi) per bucket. Calibration is the
    * eval accuracy alone hides: a filter whose high-margin bucket is
    * only 60% positive is mis-ranking exactly the documents a
    * margin-thresholded curation pass keeps (quality classifiers are
    * consumed via thresholds, so the empirical positive rate PER
    * SCORE BAND — n_pos/n, divide at display — is the operative
    * guarantee; Platt/isotonic RECALIBRATION fits on top of this
    * table, driver-side, display-time).
    *
    * Exactness: the margin is the integer feature·weight dot; the
    * bucket is floor((m − mn)·bins / (mx − mn + 1)) — pure integer,
    * always in [0, bins) (the +1 keeps m = mx inside the top bucket);
    * a degenerate constant-margin corpus collapses to bucket 0 by the
    * explicit mx = mn guard. Scale shape: one 1-row min/max aggregate
    * broadcast back (watermark-scalar posture), one map-side-combined
    * groupBy on the bucket id — no sort, no window, no quantile
    * estimation. */
  def calibrationTable(scored: DataFrame, scoreCol: String, labelCol: String,
                       bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val mm = scored.agg(min(col(scoreCol)).as("mn"), max(col(scoreCol)).as("mx"))
    scored.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("mx") === col("mn"), 0L)
          .otherwise(GraphOps.fdiv((col(scoreCol) - col("mn")) * bins,
            col("mx") - col("mn") + 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col(labelCol) === 1L, 1L)), lit(0L)).as("n_pos"),
        min(col(scoreCol)).as("lo"), max(col(scoreCol)).as("hi"))
      .select(col("bin"), col("n"), col("n_pos"), col("lo"), col("hi"))
  }

  /** Exact ROC-AUC (SURVEY.md §2 row 194) — the Mann–Whitney U
    * statistic with midrank tie handling: AUC = P(score⁺ > score⁻) +
    * ½·P(score⁺ = score⁻), the THRESHOLD-FREE companion to row 181's
    * calibration table (calibration asks "is the positive rate per
    * band honest?", AUC asks "does the classifier rank ANY positive
    * above ANY negative?" — a filter can be well-calibrated and still
    * rank garbage above gold). Reported as the exact integer pair
    * (auc_num, auc_den) = (2·Σ_pairs [s⁺>s⁻] + ties, 2·n_pos·n_neg) —
    * the ×2 absorbs the midrank halves so both wires stay BIGINT —
    * plus the single pinned division as a display double (the BM25
    * pinned-IEEE-shape rule; NULL when one class is absent, the kappa
    * empty-denominator posture).
    *
    * Scale shape (100 TB): NOT the naive pos×neg self-join (quadratic)
    * and NOT a global rank over the corpus — scores collapse first
    * into ONE map-side-combined (score → n_pos, n_neg) frame bounded
    * by |distinct scores|, the cumulative-negatives window rides that
    * bounded frame, and the pair counts fall out of one 1-row
    * aggregate: concordant = Σ_s pos_s·negBelow_s, ties = Σ_s
    * pos_s·neg_s. Rows with NULL score or label are excluded (an
    * unscored doc is no evidence either way). OVERFLOW CONTRACT:
    * n_pos·n_neg < 2^62 (~4.6e18 pairs) — beyond that, stratified
    * subsampling before the call.
    *
    * The distinct-score frame is NOT assumed bounded: a continuous
    * double score makes it corpus-sized, so the cumulative-negatives
    * prefix runs on the bucketed decomposition ([[withScoreBucket]]:
    * ≤64 order-compatible range cells from approx-quantile cuts) —
    * per-cell sums, an exclusive cell prefix over the ≤64-row cut
    * frame (the only unpartitioned window), and a within-cell window
    * partitioned by the cell. Bit-identical to the single-window form
    * (integer sums reassociate exactly); pinned by PlanSpec + the
    * continuous-score parity case in AucSpec. */
  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(coalesce(sum(when(col(labelCol) === 1L, 1L)), lit(0L)).as("pos"),
        coalesce(sum(when(col(labelCol) =!= 1L, 1L)), lit(0L)).as("neg"))
    val withB = withScoreBucket(byScore)
    val bpre = withB.groupBy(col("__b")).agg(sum(col("neg")).as("__bn"))
      .withColumn("__pre", coalesce(sum(col("__bn")).over(
        Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__bn")
    val wj = Window.partitionBy(col("__b")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(bpre), Seq("__b"))
      .withColumn("neg_below",
        col("__pre") + coalesce(sum(col("neg")).over(wj), lit(0L)))
      .agg(coalesce(sum(col("pos")), lit(0L)).as("n_pos_sum"),
        coalesce(sum(col("neg")), lit(0L)).as("n_neg_sum"),
        coalesce(sum(col("pos") * col("neg_below") * 2L +
          col("pos") * col("neg")), lit(0L)).as("num"))
      .select(col("n_pos_sum").as("n_pos"), col("n_neg_sum").as("n_neg"),
        col("num").as("auc_num"),
        (col("n_pos_sum") * col("n_neg_sum") * 2L).as("auc_den"),
        when(col("n_pos_sum") === 0L || col("n_neg_sum") === 0L, lit(null))
          .otherwise(col("num").cast(DoubleType) /
            (col("n_pos_sum") * col("n_neg_sum") * 2L).cast(DoubleType))
          .as("auc"))
  }

  /** Range-bucket the distinct-score frame into ≤`buckets`
    * order-compatible cells (approx-quantile cuts — a bounded driver
    * model of ≤63 doubles, the perceptron-weights posture). The
    * double cast is monotone though possibly non-injective: ties
    * collapse INTO one cell, never across the order, so cell-asc ==
    * score-asc and prefix sums decompose exactly. Input must carry
    * the distinct score as `s`; adds `__b` and persists (two
    * downstream passes: cuts + main). */
  private[operators] def withScoreBucket(byScore: DataFrame, buckets: Int = 64): DataFrame = {
    val persisted = byScore.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts = persisted.select(col("s").cast(DoubleType).as("__sd"))
      .stat.approxQuantile("__sd", probs, 0.01)
      .filter(d => !d.isNaN).distinct.sorted
    val sd = col("s").cast(DoubleType)
    val b = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(sd > lit(c), 1).otherwise(0)
    }
    persisted.withColumn("__b", b)
  }

  /** §2 row 194 — exact AUC of the row-118 perceptron margin against
    * the lang == 'en' label it was trained on. */
  def aucQ(s: SparkSession, d: String): DataFrame = {
    val ff = featureFrame(Tables.documents(s, d))
    val w = trainPerceptron(ff, featCols, col("y"), iters = 3)
    val margin = featCols.zip(w).map { case (f, wi) => f * lit(wi) }.reduce(_ + _)
    rocAuc(ff.select(margin.as("score"), col("y")), "score", "y")
  }

  /** Gains / lift table (SURVEY.md §2 row 206) — the third eval view
    * next to row 181 (calibration: "is the rate per score band
    * honest?") and row 194 (AUC: "is the ranking right overall?"):
    * the gains table answers the OPERATING question "if I keep only
    * the top decile by score, what fraction of all positives do I
    * capture, and at what lift over random?" — precisely how a
    * curation filter's threshold is chosen against a token budget.
    * Deciles are equal-ROW-COUNT buckets in score-DESC order using
    * the row-201 equi-depth rule (distinct score → bucket of its
    * last row; heavy score ties inflate their decile and the counts
    * report it). Per decile: rows, positives, the CUMULATIVE counts
    * through that decile, exact capture ppm (floor division), and
    * lift as ONE pinned division of two BIGINT products
    * (cum_pos·n)/(n_pos·cum_n); NULL when the corpus has no
    * positives (kappa posture).
    *
    * Scale shape: the corpus collapses to the distinct-score count
    * frame (map-side combined); the decile assignment runs on the
    * bucketed decomposition ([[withScoreBucket]], descending) so a
    * CONTINUOUS score — corpus-sized distinct frame — never rides an
    * unpartitioned window: per-cell counts, an exclusive cell prefix
    * over the ≤64-row cut frame, a within-cell cumsum partitioned by
    * cell. The decile windows ride the `buckets`-row frame. */
  def gainsTable(scored: DataFrame, scoreCol: String, labelCol: String,
                 buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val byScore = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("c"),
        coalesce(sum(when(col(labelCol) === 1L, 1L)), lit(0L)).as("p"))
    val withB = withScoreBucket(byScore)
    val bpre = withB.groupBy(col("__b")).agg(sum(col("c")).as("__bc"))
      .withColumn("__pre", coalesce(sum(col("__bc")).over(
        Window.orderBy(col("__b").desc).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__bc")
    val wj = Window.partitionBy(col("__b")).orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = withB.join(broadcast(bpre), Seq("__b"))
      .withColumn("cm", col("__pre") + sum(col("c")).over(wj))
    val tot = withB.agg(coalesce(sum(col("c")), lit(0L)).as("n"),
      coalesce(sum(col("p")), lit(0L)).as("n_pos"))
    val dec = cum.crossJoin(broadcast(tot))
      .withColumn("decile", GraphOps.fdiv((col("cm") - 1L) * buckets, col("n")))
      .groupBy(col("decile"))
      .agg(sum(col("c")).as("n_rows"), sum(col("p")).as("d_pos"),
        max(col("n")).as("n"), max(col("n_pos")).as("t_pos"))
    val w10 = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dec.withColumn("cum_n", sum(col("n_rows")).over(w10))
      .withColumn("cum_pos", sum(col("d_pos")).over(w10))
      .select(col("decile"), col("n_rows"), col("d_pos").as("n_pos"),
        col("cum_n"), col("cum_pos"),
        GraphOps.fdiv(col("cum_pos") * 1000000L, greatest(col("t_pos"), lit(1L)))
          .as("capture_ppm"),
        when(col("t_pos") === 0L, lit(null)).otherwise(
          (col("cum_pos") * col("n")).cast(DoubleType) /
            (col("t_pos") * col("cum_n")).cast(DoubleType)).as("lift"))
  }

  /** §2 row 206 — decile gains of the row-118 perceptron margin. */
  def gainsQ(s: SparkSession, d: String): DataFrame = {
    val ff = featureFrame(Tables.documents(s, d))
    val w = trainPerceptron(ff, featCols, col("y"), iters = 3)
    val margin = featCols.zip(w).map { case (f, wi) => f * lit(wi) }.reduce(_ + _)
    gainsTable(ff.select(margin.as("score"), col("y")), "score", "y")
      .orderBy(col("decile"))
  }

  /** §2 row 181 — 10-bin calibration of the row-118 perceptron's raw
    * margin against the lang == 'en' label it was trained on. */
  def calibrationQ(s: SparkSession, d: String): DataFrame = {
    val ff = featureFrame(Tables.documents(s, d))
    val w = trainPerceptron(ff, featCols, col("y"), iters = 3)
    val margin = featCols.zip(w).map { case (f, wi) => f * lit(wi) }.reduce(_ + _)
    calibrationTable(
        ff.select(margin.as("score"), col("y")), "score", "y", bins = 10)
      .orderBy(col("bin"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_perceptron"  -> (perceptronQ _),
    "q_calibration" -> (calibrationQ _),
    "q_auc"         -> (aucQ _),
    "q_gains"       -> (gainsQ _),
  )

  /** Feature SQL shared by every iteration (x0..x4 + label y). */
  private val featSql =
    """f AS MATERIALIZED (
      |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
      |    CAST(1 AS BIGINT) AS x0,
      |    CAST(length(text) AS BIGINT) AS x1,
      |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS x2,
      |    CAST(length(lower(text)) - length(regexp_replace(lower(text), '[aeiou]', '', 'g')) AS BIGINT) AS x3,
      |    CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS BIGINT) AS x4
      |  FROM documents)""".stripMargin

  private val dims = 0 to 4
  private def dotSql(w: String) =
    dims.map(j => s"$w.w$j * x$j").mkString(" + ")

  /** One unrolled batch update: `w$i` from `w$p`. */
  private def stepSql(i: Int, p: Int): String = {
    // CAST back to BIGINT: DuckDB SUM(BIGINT) widens to HUGEINT, which
    // the compare harness would coerce through float64 — the cast keeps
    // the parity bit-exact int64-vs-int64 (the repo-wide oracle contract)
    val upd = dims.map(j =>
      s"CAST(w.w$j + COALESCE(SUM(CASE WHEN y * (${dotSql("w")}) <= 0 THEN y * x$j END), 0) AS BIGINT) AS w$j")
      .mkString(",\n    ")
    s"""w$i AS (
       |  SELECT $upd
       |  FROM f CROSS JOIN w$p w
       |  GROUP BY ${dims.map(j => s"w.w$j").mkString(", ")})""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_perceptron" ->
      s"""WITH $featSql,
         |w0 AS (SELECT ${dims.map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")}),
         |${stepSql(1, 0)},
         |${stepSql(2, 1)},
         |${stepSql(3, 2)}
         |SELECT name, value FROM (
         |${dims.map(j => s"  SELECT 'w$j' AS name, w$j AS value FROM w3")
            .mkString("\n  UNION ALL\n")}
         |  UNION ALL
         |  SELECT 'misclassified',
         |    CAST(COALESCE(SUM(CASE WHEN y <> (CASE WHEN ${dotSql("w")} > 0 THEN 1 ELSE -1 END)
         |                      THEN 1 END), 0) AS BIGINT)
         |  FROM f CROSS JOIN w3 w) _out
         |ORDER BY name""".stripMargin,

    // the q_perceptron training unroll shared verbatim (same featSql/
    // step CTEs), then integer margins, the 1-row min/max, and the
    // floor-div bucket; mx = mn guard replayed; HUGEINT sums → BIGINT
    "q_calibration" -> {
      def fd(a: String, b: String) =
        s"((($a) - (((($a) % ($b)) + ($b)) % ($b))) // ($b))"
      s"""WITH $featSql,
         |w0 AS (SELECT ${dims.map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")}),
         |${stepSql(1, 0)},
         |${stepSql(2, 1)},
         |${stepSql(3, 2)},
         |marg AS (SELECT y, ${dotSql("w")} AS m FROM f CROSS JOIN w3 w),
         |mm AS (SELECT MIN(m) AS mn, MAX(m) AS mx FROM marg),
         |bk AS (
         |  SELECT y, m,
         |    CASE WHEN mm.mx = mm.mn THEN 0
         |         ELSE ${fd("(m - mm.mn) * 10", "mm.mx - mm.mn + 1")} END AS bin
         |  FROM marg CROSS JOIN mm)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COALESCE(SUM(CASE WHEN y = 1 THEN 1 END), 0) AS BIGINT) AS n_pos,
         |  CAST(MIN(m) AS BIGINT) AS lo, CAST(MAX(m) AS BIGINT) AS hi
         |FROM bk
         |GROUP BY bin
         |ORDER BY bin""".stripMargin
    },

    // the same training unroll, then the distinct-margin collapse, the
    // strictly-below cumulative-negatives window and the doubled
    // Mann-Whitney pair count; single pinned division for the display
    // double; HUGEINT sums/products → BIGINT at every output wire
    "q_auc" ->
      s"""WITH $featSql,
         |w0 AS (SELECT ${dims.map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")}),
         |${stepSql(1, 0)},
         |${stepSql(2, 1)},
         |${stepSql(3, 2)},
         |marg AS (SELECT y, ${dotSql("w")} AS m FROM f CROSS JOIN w3 w),
         |bys AS (
         |  SELECT m AS s,
         |    CAST(COALESCE(SUM(CASE WHEN y = 1 THEN 1 END), 0) AS BIGINT) AS pos,
         |    CAST(COALESCE(SUM(CASE WHEN y <> 1 THEN 1 END), 0) AS BIGINT) AS neg
         |  FROM marg GROUP BY m),
         |cum AS (
         |  SELECT pos, neg,
         |    CAST(COALESCE(SUM(neg) OVER (ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS neg_below
         |  FROM bys),
         |agg AS (
         |  SELECT CAST(COALESCE(SUM(pos), 0) AS BIGINT) AS n_pos,
         |    CAST(COALESCE(SUM(neg), 0) AS BIGINT) AS n_neg,
         |    CAST(COALESCE(SUM(pos * neg_below * 2 + pos * neg), 0) AS BIGINT) AS num
         |  FROM cum)
         |SELECT n_pos, n_neg, num AS auc_num,
         |  CAST(n_pos * n_neg * 2 AS BIGINT) AS auc_den,
         |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
         |       ELSE CAST(num AS DOUBLE) / CAST(n_pos * n_neg * 2 AS DOUBLE) END AS auc
         |FROM agg""".stripMargin,

    // the same unroll, distinct-margin counts, the score-DESC
    // inclusive cumsum, the equi-depth decile rule (nonneg // ==
    // floor), the 10-row cumulative window, exact capture ppm and the
    // single pinned lift division; HUGEINT → BIGINT everywhere
    "q_gains" ->
      s"""WITH $featSql,
         |w0 AS (SELECT ${dims.map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")}),
         |${stepSql(1, 0)},
         |${stepSql(2, 1)},
         |${stepSql(3, 2)},
         |marg AS (SELECT y, ${dotSql("w")} AS m FROM f CROSS JOIN w3 w),
         |bys AS (
         |  SELECT m AS s, CAST(COUNT(*) AS BIGINT) AS c,
         |    CAST(COALESCE(SUM(CASE WHEN y = 1 THEN 1 END), 0) AS BIGINT) AS p
         |  FROM marg GROUP BY m),
         |cum AS (
         |  SELECT s, c, p,
         |    CAST(SUM(c) OVER (ORDER BY s DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm
         |  FROM bys),
         |tot AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n,
         |               CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos FROM bys),
         |dec AS (
         |  SELECT CAST((cm - 1) * 10 // n AS BIGINT) AS decile,
         |    CAST(SUM(c) AS BIGINT) AS n_rows, CAST(SUM(p) AS BIGINT) AS d_pos,
         |    CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(n_pos) AS BIGINT) AS t_pos
         |  FROM cum CROSS JOIN tot GROUP BY 1),
         |g AS (
         |  SELECT decile, n_rows, d_pos, n, t_pos,
         |    CAST(SUM(n_rows) OVER (ORDER BY decile
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
         |    CAST(SUM(d_pos) OVER (ORDER BY decile
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
         |  FROM dec)
         |SELECT decile, n_rows, d_pos AS n_pos, cum_n, cum_pos,
         |  CAST(cum_pos * 1000000 // greatest(t_pos, 1) AS BIGINT) AS capture_ppm,
         |  CASE WHEN t_pos = 0 THEN NULL
         |       ELSE CAST(cum_pos * n AS DOUBLE) / CAST(t_pos * cum_n AS DOUBLE)
         |  END AS lift
         |FROM g ORDER BY decile""".stripMargin,
  )
}
