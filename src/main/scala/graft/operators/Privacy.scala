package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** k-anonymity audit + suppression (SURVEY.md §2 row 155) — the
  * privacy gate a training-data pipeline needs BEFORE text-level PII
  * redaction (row 60) can be called sufficient: redaction removes
  * direct identifiers, but a row whose QUASI-identifier combination
  * (language × source × length bucket, zip × age × gender, …) is
  * shared by fewer than k rows is re-identifiable by linkage even
  * with every name scrubbed. The audit reports every equivalence
  * class with its size and risk flag; suppression nulls the quasi
  * columns of below-k rows (generalization-by-suppression — the
  * class everyone else remains in is untouched), so the released
  * frame is k-anonymous by construction.
  *
  * Scale shape: ONE exchange. Class sizes are a COUNT over the
  * quasi-key window — no audit⋈data join-back (the join formulation
  * shuffles the data twice); suppression is a conditional projection
  * over the same windowed frame, and the audit collapse groups on
  * the window's own partition keys, reusing its exchange. The
  * equivalence-class frame is bounded by the quasi-key domain, not
  * the corpus.
  *
  * NULL quasi values: treated as a VALUE (SQL GROUP BY semantics both
  * engines share) — all-NULL rows form their own class; that matches
  * the linkage-attack model, where "field missing" is itself an
  * observable. */
object Privacy {

  /** Tag every row with its equivalence-class size `class_n` over
    * `quasiCols` and `at_risk = class_n < k`. Pure window + projection. */
  def tagKAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("class_n", count(lit(1)).over(w))
      .withColumn("at_risk", col("class_n") < k)
  }

  /** The audit report: one row per equivalence class. */
  def audit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    tagKAnonymity(df, quasiCols, k)
      .groupBy(quasiCols.map(col) :+ col("class_n") :+ col("at_risk"): _*)
      .agg(count(lit(1)).as("n_rows")) // == class_n; kept as a cross-check
      .drop("n_rows")

  /** Suppress: null out the quasi columns of rows in below-k classes;
    * other columns and row count are untouched. */
  def suppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val tagged = tagKAnonymity(df, quasiCols, k)
    val suppressed = quasiCols.foldLeft(tagged) { (d, c) =>
      d.withColumn(c, when(col("at_risk"), lit(null)).otherwise(col(c)))
    }
    suppressed.drop("class_n", "at_risk")
  }

  /** l-diversity audit — the homogeneity-attack companion: a class
    * can be k-anonymous yet leak completely when every member shares
    * the same SENSITIVE value (a linker learns it without identifying
    * anyone). Reports per class the size AND the exact distinct count
    * of the sensitive attribute; `at_risk` when either bound fails.
    * One grouped aggregation (count + exact count-distinct — Spark's
    * two-phase distinct agg, still a single logical pass). */
  def auditLDiversity(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot be a quasi-identifier")
    require(k >= 2 && l >= 2, s"k and l must be >= 2, got ($k, $l)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_n"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("at_risk", col("class_n") < k || col("n_sensitive") < l)
  }

  /** Generalization ladder (global recoding) — the k-anonymity repair
    * that PRESERVES utility where suppression destroys it: instead of
    * nulling at-risk rows, coarsen the numeric quasi-identifier
    * (bucket width `baseWidth`·2^j) to the MINIMAL level j at which
    * every (fixedCols, bucket_j) class reaches k, then release every
    * row at that one global level. Returns (chosenLevel, release); if
    * even the coarsest level fails, the release falls back to
    * suppression at the top level (the standard generalize-then-
    * suppress combo) and chosenLevel = levels-1.
    *
    * Scale shape: all levels are evaluated in ONE pass — each row
    * explodes to its `levels` (level, bucket) pairs, but hash
    * aggregation combines map-side, so what shuffles is the
    * DISTINCT-cell frame × levels (quasi-domain-bounded), never
    * levels× the corpus; per-level minima are a second aggregation
    * over cells, and only `levels` rows reach the driver. (An
    * early-stop iterative probe would beat this when level 0 usually
    * qualifies, but pays one job per probed level; one worst-case
    * pass is the better default.) The release is a pure projection. */
  def generalizeToK(df: DataFrame, fixedCols: Seq[String], numCol: String,
                    baseWidth: Long, levels: Int, k: Long): (Int, DataFrame) = {
    require(baseWidth > 0 && levels >= 1 && levels <= 30, s"bad ladder ($baseWidth, $levels)")
    require(k >= 2, s"k must be >= 2, got $k")
    val pairs = array((0 until levels).map(j =>
      struct(lit(j).as("lvl"),
        GraphOps.fdiv(col(numCol), lit(baseWidth << j)).as("b"))): _*)
    val minPerLevel = df
      .select(fixedCols.map(col) :+ explode(pairs).as("e"): _*)
      .groupBy(col("e.lvl").as("lvl") +: fixedCols.map(col) :+ col("e.b").as("b"): _*)
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lvl")).agg(min(col("c")).as("mn"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val chosen = (0 until levels).find(j => minPerLevel.getOrElse(j, 0L) >= k)
    chosen match {
      case Some(j) =>
        (j, df.withColumn(numCol,
          GraphOps.fdiv(col(numCol), lit(baseWidth << j))))
      case None =>
        val top = levels - 1
        val coarse = df.withColumn(numCol,
          GraphOps.fdiv(col(numCol), lit(baseWidth << top)))
        (top, suppress(coarse, fixedCols :+ numCol, k))
    }
  }

  /** t-closeness audit — the third classic: an l-diverse class whose
    * sensitive DISTRIBUTION still skews far from the corpus-wide one
    * leaks probabilistically (a linker's posterior shifts by the
    * skew). Reports per class the EXACT total-variation distance as
    * an integer fraction — TVD = num/(2·N_c·N_g) with
    * num = Σ_v |c_{cv}·N_g − g_v·N_c| — and flags classes with
    * TVD > tNum/tDen by integer cross-multiplication (5·num >
    * 2·N_c·N_g for t = 1/5): no floats anywhere, parity hash-exact.
    * Sensitive values ABSENT from a class still contribute their
    * g_v·N_c term; that sum folds algebraically into
    * N_c·(N_g − Σ_{v∈c} g_v), so only PRESENT (class, value) pairs
    * are ever materialized.
    *
    * Scale shape: one aggregation of data rows to the (class, value)
    * frame; class totals, per-value global totals and the corpus
    * total are three chained windows over that bounded frame (the
    * unpartitioned one rides a frame bounded by |classes|·|sensitive
    * domain|, never the corpus); the collapse groups on the class
    * window's keys. Integer-exactness contract: products reach
    * N_c·N_g, so longs are exact while that stays below 2^63
    * (~3·10^9 rows per side) — switch the products to DECIMAL(38,0)
    * past that. */
  def auditTCloseness(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, tNum: Long, tDen: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot be a quasi-identifier")
    require(tNum > 0 && tDen > 0 && tNum < tDen,
      s"t must be a fraction in (0,1), got $tNum/$tDen")
    val qc = quasiCols.map(col)
    val cv = df.groupBy(qc :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__cv"))
    val wClass = Window.partitionBy(qc: _*)
    val wValue = Window.partitionBy(col(sensitiveCol))
    val wAll = Window.partitionBy()
    cv.withColumn("__gv", sum(col("__cv")).over(wValue))
      .withColumn("__nc", sum(col("__cv")).over(wClass))
      .withColumn("__sg", sum(col("__gv")).over(wClass))
      .withColumn("__ng", sum(col("__cv")).over(wAll))
      .groupBy(qc :+ col("__nc").as("class_n") :+ col("__ng"): _*)
      .agg(sum(abs(col("__cv") * col("__ng") - col("__gv") * col("__nc")))
        .as("__present"),
        min(col("__sg")).as("__sgm"))
      .withColumn("tvd_num",
        col("__present") + col("class_n") * (col("__ng") - col("__sgm")))
      .withColumn("tvd_den", lit(2L) * col("class_n") * col("__ng"))
      .withColumn("at_risk", lit(tDen) * col("tvd_num") > lit(tNum) * col("tvd_den"))
      .select(qc :+ col("class_n") :+ col("tvd_num") :+ col("tvd_den")
        :+ col("at_risk"): _*)
  }

  // quasi-identifiers for the documents gate: language × source ×
  // coarse length bucket (n_chars div 100)
  private def quasiDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        GraphOps.fdiv(col("n_chars"), lit(100L)).as("len_bucket"))

  private val K = 3L

  /** §2 row 155 — the equivalence-class audit. */
  def kanonAuditQ(s: SparkSession, dir: String): DataFrame =
    audit(quasiDocs(s, dir), Seq("lang", "source", "len_bucket"), K)
      .orderBy(col("lang"), col("source"), col("len_bucket"))

  /** §2 row 155 — the suppressed release. */
  def kanonSuppressQ(s: SparkSession, dir: String): DataFrame =
    suppress(quasiDocs(s, dir), Seq("lang", "source", "len_bucket"), K)
      .orderBy(col("doc_id"))

  /** §2 row 155 — l-diversity over (source, len_bucket) with `lang`
    * as the sensitive attribute. */
  def ldivAuditQ(s: SparkSession, dir: String): DataFrame =
    auditLDiversity(quasiDocs(s, dir), Seq("source", "len_bucket"),
        "lang", K, 2L)
      .orderBy(col("source"), col("len_bucket"))

  /** §2 row 155 — minimal-level generalization over (lang, n_chars)
    * with an 8-rung width ladder 100·2^j. */
  def kanonGeneralizeQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      col("n_chars"))
    val (lvl, rel) = generalizeToK(docs, Seq("lang"), "n_chars", 100L, 8, K)
    rel.select(col("doc_id"), col("lang"),
        col("n_chars").as("len_bucket"), lit(lvl.toLong).as("level"))
      .orderBy(col("doc_id"))
  }

  /** §2 row 155 — t-closeness of each source's language distribution
    * against the corpus-wide one, t = 1/10. */
  def tcloseAuditQ(s: SparkSession, dir: String): DataFrame =
    auditTCloseness(Tables.documents(s, dir), Seq("source"), "lang", 1L, 10L)
      .orderBy(col("source"))

  // ---- Deterministic discrete-Laplace release (§2 row 170) -----------

  /** Trailing-zero count of the 64-bit hash image — Geometric(1/2)
    * over a uniform hash: P(tz = k) = 2^-(k+1). Bit trick:
    * (h & -h) isolates the lowest set bit (two's-complement wrap is
    * the point), minus 1 turns it into tz ones, bit_count counts
    * them; h = 0 means all 64 positions are "zeros". */
  private def trailingZeros(h: Column): Column =
    when(h === 0L, lit(64L))
      .otherwise(call_function("bit_count",
        h.bitwiseAND(negate(h)) - 1L).cast(org.apache.spark.sql.types.LongType))

  /** Noised group-count release under deterministic discrete-Laplace
    * noise — the privacy family's AGGREGATE release (rows 155's
    * audits gate the microdata; this releases statistics): released =
    * count + Z where Z = G₁ − G₂ with G_i iid Geometric(1/2) drawn
    * from domain-prefixed key hashes, which is EXACTLY the discrete
    * Laplace P(Z = z) = 2^-|z|/3 — the ε = ln 2 mechanism for
    * sensitivity-1 counts. No ln(), no float: the geometric is the
    * trailing-zero count of a uniform 64 bits (P(tz=k)=2^-(k+1)),
    * pure bit arithmetic both engines replay exactly.
    *
    * Determinism is a deliberate trade, stated honestly: noise is a
    * pure function of (salt, group key), so re-releases REPRODUCE
    * (backfills agree, diffs are meaningful) and repeated queries
    * cannot average the noise away — but an adversary knowing the
    * salt can strip it; the formal guarantee holds only while the
    * salt is secret (rotate it per release epoch for fresh draws).
    * Scale: one grouped count (map-side combined) + a per-group
    * projection; the released frame is group-domain bounded. */
  def dpCountRelease(df: DataFrame, keyCols: Seq[String], salt: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val keyStr = concat_ws("\u0001",
      keyCols.map(c => coalesce(col(c).cast(org.apache.spark.sql.types.StringType),
        lit("\u0000"))): _*)
    def geo(prefix: String) = trailingZeros(
      graft.plans.PolyHash64.poly_hash64(concat(lit(s"$prefix$salt|"), keyStr)))
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .select(keyCols.map(col) :+
        (col("__n") + geo("dpa|") - geo("dpb|")).as("released"): _*)
  }

  /** §2 row 170 — released per-(lang, source) doc counts, epoch salt
    * "r10". */
  def dpCountsQ(s: SparkSession, dir: String): DataFrame =
    dpCountRelease(Tables.documents(s, dir), Seq("lang", "source"), "r10")
      .orderBy(col("lang"), col("source"))

  /** Pseudonymization with collision audit (SURVEY.md §2 row 226) —
    * the identifier-replacement step that precedes any data sharing:
    * user ids map to domain-salted hash pseudonyms (deterministic —
    * the same user pseudonymizes identically across tables, which is
    * the point: joins survive, identities don't), truncated to a
    * configurable bit width because SHORT pseudonyms are what
    * downstream schemas want — and truncation is where the silent
    * failure lives: two users sharing a pseudonym MERGE in every
    * downstream join (corrupted analytics, and a privacy defect in
    * reverse — one user's data attributed to another). The audit
    * reports every colliding pseudonym with its id count and member
    * ids BEFORE the release ships; the birthday bound (~n²/2^{bits+1}
    * expected collisions) says how wide to go.
    *
    * Scale shape: distinct ids → one hash projection → one map-side
    * pseudonym groupBy; output bounded by the collision count.
    * Members are collected per colliding pseudonym SORTED (array
    * equality both engines) — collision groups are tiny by
    * construction or the width is wrong anyway. */
  def pseudonymCollisions(df: DataFrame, idCol: Column, salt: String,
                          bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
    val ids = df.select(idCol.cast(org.apache.spark.sql.types.StringType)
      .as("id")).filter(col("id").isNotNull).distinct()
    ids.withColumn("pseudonym",
        pmod(graft.plans.PolyHash64.poly_hash64(
          concat(lit(s"$salt|"), col("id"))), lit(1L << bits)))
      .groupBy(col("pseudonym"))
      .agg(count(lit(1)).as("n_ids"),
        array_join(sort_array(collect_list(col("id"))), ",").as("ids"))
      .filter(col("n_ids") >= 2L)
      .select(col("pseudonym"), col("n_ids"), col("ids"))
  }

  /** §2 row 226 — event user ids pseudonymized into 10 bits (narrow on
    * purpose so the audit fires on the test corpus). */
  def pseudonymQ(s: SparkSession, dir: String): DataFrame =
    pseudonymCollisions(Tables.events(s, dir), col("user_id"), "pseud", bits = 10)
      .orderBy(col("pseudonym"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pseudonym"        -> (pseudonymQ _),
    "q_kanon_audit"      -> (kanonAuditQ _),
    "q_kanon_suppress"   -> (kanonSuppressQ _),
    "q_ldiv_audit"       -> (ldivAuditQ _),
    "q_kanon_generalize" -> (kanonGeneralizeQ _),
    "q_tclose_audit"     -> (tcloseAuditQ _),
    "q_dp_counts"        -> (dpCountsQ _))

  val oracles: Map[String, String] = Map(
    // distinct ids, the shared salted poly_hash64, Java floor-mod to
    // the 10-bit space, and the sorted comma-joined collision members
    "q_pseudonym" -> {
      val hs = TrainingOps.polyHashOverSql("id",
        """SELECT id, 'pseud|' || id AS t FROM (
          |  SELECT DISTINCT CAST(user_id AS VARCHAR) AS id
          |  FROM events WHERE user_id IS NOT NULL) _d""".stripMargin)
      s"""WITH hs AS ($hs),
         |p AS (SELECT id, CAST((h % 1024 + 1024) % 1024 AS BIGINT) AS pseudonym
         |      FROM hs)
         |SELECT pseudonym, CAST(COUNT(*) AS BIGINT) AS n_ids,
         |  string_agg(id, ',' ORDER BY id) AS ids
         |FROM p GROUP BY pseudonym
         |HAVING COUNT(*) >= 2
         |ORDER BY pseudonym""".stripMargin
    },

    "q_kanon_audit" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, source,
         |    CAST((n_chars - (n_chars % 100)) / 100 AS BIGINT) AS len_bucket
         |  FROM documents),
         |t AS (
         |  SELECT lang, source, len_bucket,
         |    CAST(COUNT(*) OVER (PARTITION BY lang, source, len_bucket) AS BIGINT)
         |      AS class_n
         |  FROM q)
         |SELECT DISTINCT lang, source, len_bucket, class_n,
         |  class_n < $K AS at_risk
         |FROM t
         |ORDER BY lang, source, len_bucket""".stripMargin,

    // the full ladder in one replay: per-level class minima via a
    // range(8) cross join, chosen = MIN qualifying level, release
    // bucketed at the chosen width (1 << chosen)
    // replays the engine's fallback too: when NO level reaches k, the
    // release is the TOP-level recoding with small classes suppressed
    // (quasi columns NULLed), never a NULL bucket for every row
    "q_kanon_generalize" ->
      s"""WITH lv AS (SELECT unnest(range(8)) AS lvl),
         |cells AS (
         |  SELECT lvl, lang, n_chars // (100 * (1 << lvl)) AS b, COUNT(*) AS c
         |  FROM documents CROSS JOIN lv GROUP BY 1, 2, 3),
         |mins AS (SELECT lvl, MIN(c) AS mn FROM cells GROUP BY 1),
         |ch AS (SELECT MIN(lvl) AS raw FROM mins WHERE mn >= $K),
         |ch2 AS (SELECT COALESCE(raw, 7) AS chosen, raw IS NULL AS fb FROM ch),
         |rel AS (
         |  SELECT doc_id, lang,
         |    n_chars // (100 * (1 << chosen)) AS lb, chosen, fb
         |  FROM documents CROSS JOIN ch2),
         |cls AS (
         |  SELECT doc_id, lang, lb, chosen, fb,
         |    COUNT(*) OVER (PARTITION BY lang, lb) AS class_n
         |  FROM rel)
         |SELECT doc_id,
         |  CASE WHEN fb AND class_n < $K THEN NULL ELSE lang END AS lang,
         |  CAST(CASE WHEN fb AND class_n < $K THEN NULL ELSE lb END AS BIGINT)
         |    AS len_bucket,
         |  CAST(chosen AS BIGINT) AS level
         |FROM cls
         |ORDER BY doc_id""".stripMargin,

    // (class, value) counts + three layered window sums + the
    // absent-pair fold N_c·(N_g − Σ_present g_v); flag by integer
    // cross-multiplication — no floats on either engine
    "q_tclose_audit" ->
      """WITH cv AS (
        |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cv
        |  FROM documents GROUP BY 1, 2),
        |w AS (
        |  SELECT source, lang, cv,
        |    SUM(cv) OVER (PARTITION BY lang) AS gv,
        |    SUM(cv) OVER (PARTITION BY source) AS nc,
        |    SUM(cv) OVER () AS ng
        |  FROM cv),
        |w2 AS (
        |  SELECT *, SUM(gv) OVER (PARTITION BY source) AS sg FROM w),
        |a AS (
        |  SELECT source, CAST(nc AS BIGINT) AS class_n, ng,
        |    SUM(ABS(cv * ng - gv * nc)) AS present, MIN(sg) AS sgm
        |  FROM w2 GROUP BY source, nc, ng)
        |SELECT source, class_n,
        |  CAST(present + class_n * (ng - sgm) AS BIGINT) AS tvd_num,
        |  CAST(2 * class_n * ng AS BIGINT) AS tvd_den,
        |  (10 * (present + class_n * (ng - sgm)) > 2 * class_n * ng) AS at_risk
        |FROM a
        |ORDER BY source""".stripMargin,

    "q_ldiv_audit" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, source,
         |    CAST((n_chars - (n_chars % 100)) / 100 AS BIGINT) AS len_bucket
         |  FROM documents)
         |SELECT source, len_bucket,
         |  CAST(COUNT(*) AS BIGINT) AS class_n,
         |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_sensitive,
         |  (COUNT(*) < $K OR COUNT(DISTINCT lang) < 2) AS at_risk
         |FROM q GROUP BY source, len_bucket
         |ORDER BY source, len_bucket""".stripMargin,

    "q_kanon_suppress" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, source,
         |    CAST((n_chars - (n_chars % 100)) / 100 AS BIGINT) AS len_bucket
         |  FROM documents),
         |t AS (
         |  SELECT doc_id, lang, source, len_bucket,
         |    COUNT(*) OVER (PARTITION BY lang, source, len_bucket) AS class_n
         |  FROM q)
         |SELECT doc_id,
         |  CASE WHEN class_n < $K THEN NULL ELSE lang END AS lang,
         |  CASE WHEN class_n < $K THEN NULL ELSE source END AS source,
         |  CASE WHEN class_n < $K THEN NULL ELSE len_bucket END AS len_bucket
         |FROM t
         |ORDER BY doc_id""".stripMargin,

    // the geometric draws replayed bit-for-bit: HUGEINT hash image,
    // trailing zeros via bit_count(xor(m, m-1)) - 1, noise = tz_a - tz_b
    "q_dp_counts" -> {
      def hashCte(prefix: String) = TrainingOps.polyHashOverSql("lang, source",
        s"""SELECT lang, source,
           |  '$prefix' || concat_ws(chr(1),
           |    COALESCE(CAST(lang AS VARCHAR), chr(0)),
           |    COALESCE(CAST(source AS VARCHAR), chr(0))) AS t
           |FROM (SELECT DISTINCT lang, source FROM documents) _k""".stripMargin)
      def tz(h: String, m: String, tzn: String) =
        s"""SELECT lang, source,
           |  CASE WHEN $m = 0 THEN 64
           |       ELSE bit_count(xor($m, $m - 1)) - 1 END AS $tzn
           |FROM (SELECT lang, source,
           |        CASE WHEN $h < 0
           |          THEN CAST($h AS HUGEINT) + 18446744073709551616
           |          ELSE CAST($h AS HUGEINT) END AS $m
           |      FROM __HCTE__) _m""".stripMargin
      s"""WITH cnts AS (
         |  SELECT lang, source, COUNT(*) AS n
         |  FROM documents GROUP BY lang, source),
         |ha AS (${hashCte("dpa|r10|")}),
         |hb AS (${hashCte("dpb|r10|")}),
         |za AS (${tz("h", "m", "tza").replace("__HCTE__", "ha")}),
         |zb AS (${tz("h", "m", "tzb").replace("__HCTE__", "hb")})
         |SELECT c.lang, c.source,
         |  CAST(c.n + za.tza - zb.tzb AS BIGINT) AS released
         |FROM cnts c
         |JOIN za ON c.lang = za.lang AND c.source = za.source
         |JOIN zb ON c.lang = zb.lang AND c.source = zb.source
         |ORDER BY c.lang, c.source""".stripMargin
    },
  )
}
