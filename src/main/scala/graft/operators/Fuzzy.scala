package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Fuzzy string matching (edit-distance dedup of a key space — entity
  * resolution over names/titles in a curation pipeline).
  *
  * Blocking is by length band: |len(a) - len(b)| <= maxDist is a
  * NECESSARY condition for levenshtein(a, b) <= maxDist, so banding
  * lengths into width-(maxDist+1) buckets and exploding each string
  * into (band, band+1) guarantees every qualifying pair collides in
  * some band — candidates scale with band collisions, never n².
  * Levenshtein runs only on candidates (codegen'd built-in).
  */
object Fuzzy {

  /** All pairs (a < b) of distinct values of `strCol` with edit
    * distance <= maxDist. */
  def matchPairs(df: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val w = maxDist + 1
    val names = df.select(col(strCol).as("s")).filter(col("s").isNotNull).distinct()
      .withColumn("len", length(col("s")))
    val banded = names.withColumn("band",
      explode(array(floor(col("len") / w), floor(col("len") / w) + 1)))
    val a = banded.select(col("band"), col("s").as("name_a"), col("len").as("len_a"))
    val b = banded.select(col("band").as("band_b"), col("s").as("name_b"), col("len").as("len_b"))
    a.join(b, col("band") === col("band_b") && col("name_a") < col("name_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .dropDuplicates("name_a", "name_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast(LongType))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"))
  }

  /** q_fuzzy_match — near-identical part names (edit distance <= 2)
    * over the distinct name space. */
  def fuzzyMatchQ(s: SparkSession, d: String): DataFrame =
    matchPairs(Tables.part(s, d), "p_name", maxDist = 2)
      .orderBy(col("name_a"), col("name_b"))

  /** Phonetic blocking key (SURVEY.md §2 row 240) — the third
    * blocking family next to band-blocked edit distance and SNM:
    * sounds-alike candidates that char-edit blocking misses or
    * over-pays for ("Robert"/"Rupert" are edit distance 3 — past any
    * affordable maxDist; their phonetic keys are both R163). Soundex
    * on pure column ops so both engines compute the identical key by
    * construction (RE2 has no backreferences, so the run collapse is
    * a per-digit regex chain; the vowel marker is collapsed WITH the
    * runs — vowel-separated repeats also merge, the documented
    * difference from archival Soundex): letters only, uppercase, the
    * classic digit map (B F P V→1, C G J K Q S X Z→2, D T→3, L→4,
    * M N→5, R→6, vowels+H W Y→0), adjacent-run collapse, zeros
    * dropped after the first letter, first letter + 3 digits
    * zero-padded. NULL for letterless input. Zero shuffles. */
  def phoneticKey(w: Column): Column = {
    val u = upper(regexp_replace(w, "[^A-Za-z]", ""))
    val codes = translate(u,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202")
    val collapsed = (0 to 6).map(_.toString).foldLeft(codes) {
      (c, d) => regexp_replace(c, d + d + "+", d)
    }
    val digits = regexp_replace(substring(collapsed, 2, Int.MaxValue), "0", "")
    when(length(u) > 0,
      concat(substring(u, 1, 1), rpad(substring(digits, 1, 3), 3, "0")))
  }

  /** q_phonetic_block — sounds-alike blocks over the part-name
    * vocabulary plus deterministic misspelling variants seeded IN
    * BOTH ENGINES (the truecase damage-seeding precedent): an
    * all-vowel swap (e→a) and a doubled second letter — both
    * soundex-invariant by construction, so every damaged word must
    * land in its original's block. Output: every key holding >= 2
    * distinct words with its members (the candidate set an ER pass
    * scores pairwise — block sizes bound the quadratic work). */
  def phoneticBlockQ(s: SparkSession, d: String): DataFrame = {
    val base = Tables.part(s, d)
      .select(explode(split(lower(col("p_name")), " ")).as("w"))
      .filter(length(col("w")) > 1)
    val vowelSwap = base.select(regexp_replace(col("w"), "e", "a").as("w"))
    val doubled = base.select(concat(substring(col("w"), 1, 2),
      substring(col("w"), 2, Int.MaxValue)).as("w"))
    base.unionByName(vowelSwap).unionByName(doubled).distinct()
      .withColumn("key", phoneticKey(col("w")))
      .filter(col("key").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_words"),
        array_join(sort_array(collect_list(col("w"))), " ").as("words"))
      .filter(col("n_words") >= 2)
      .orderBy(col("key"))
  }

  // ---- Jaro-Winkler entity resolution (§2 rows 161/162) ----

  /** Mention frame for the registered ER queries: part names with a
    * DETERMINISTIC typo model replayed identically in both engines
    * (drop last char / uppercase first / double last char, keyed on
    * p_partkey mod 11) — so the resolver faces real variation, not
    * just exact-duplicate names. */
  private def mentions(s: SparkSession, d: String): DataFrame = {
    val k = pmod(col("p_partkey"), lit(11))
    Tables.part(s, d).select(
      col("p_partkey").cast(LongType).as("id"),
      when(k === 0, expr("substring(p_name, 1, length(p_name)-1)"))
        .when(k === 1,
          concat(upper(substring(col("p_name"), 1, 1)), expr("substring(p_name, 2)")))
        .when(k === 2,
          concat(col("p_name"), expr("substring(p_name, length(p_name), 1)")))
        .otherwise(col("p_name")).as("nm"))
  }

  /** Candidate pairs over the DISTINCT-string frame: each distinct
    * name is represented by its min mention id (`nid`), blocked on
    * the lowercased 3-char prefix, scored with the native
    * [[JaroWinkler]] expression. Similarity never runs per corpus
    * row — the pair frame is bounded by the string DOMAIN squared
    * within a block, not the mention count (names repeat massively;
    * scoring repeats is pure waste at any scale). */
  def jaroPairs(m: DataFrame, threshold: Double): DataFrame = {
    val dn = m.groupBy(col("nm")).agg(min(col("id")).as("nid"))
      .withColumn("blk", lower(substring(col("nm"), 1, 3)))
    dn.as("a").join(dn.as("b"),
        col("a.blk") === col("b.blk") && col("a.nid") < col("b.nid"))
      .withColumn("sim",
        graft.plans.JaroWinkler.jaro_winkler(col("a.nm"), col("b.nm")))
      .filter(col("sim") >= threshold)
      .select(col("a.nid").as("na"), col("b.nid").as("nb"), col("sim"))
  }

  /** Full entity resolution: similarity edges over distinct names →
    * connected components → every mention labeled with its entity
    * (the component-min nid; unmatched names are their own entity)
    * and the entity's canonical name (the name that OWNS the min
    * nid). The corpus-sized frames only ever see equi-joins against
    * the name-domain-bounded (nm → entity) map — broadcast-sized at
    * any corpus scale. */
  def entityResolve(m: DataFrame, threshold: Double): DataFrame = {
    val dn = m.groupBy(col("nm")).agg(min(col("id")).as("nid"))
    val pairs = jaroPairs(m, threshold)
    val cm = Dedup.connectedComponents(pairs, "na", "nb")
      .withColumnRenamed("id", "nid")
    val withComp = dn.join(cm, Seq("nid"), "left")
      .withColumn("entity", coalesce(col("comp"), col("nid")))
    val canon = withComp.filter(col("nid") === col("entity"))
      .select(col("entity"), col("nm").as("canonical"))
    m.join(broadcast(withComp.select(col("nm"), col("entity"))), Seq("nm"))
      .join(broadcast(canon), Seq("entity"))
      .select(col("id"), col("entity"), col("canonical"))
  }

  private val JwThreshold = 0.91

  /** q_jaro_pairs — the scored candidate-pair frame itself: the
    * oracle replays the DOUBLE bit-exactly against DuckDB's
    * jaro_winkler_similarity. */
  def jaroPairsQ(s: SparkSession, d: String): DataFrame =
    jaroPairs(mentions(s, d), JwThreshold)
      .orderBy(col("na"), col("nb"))

  /** q_entity_resolution — mention → entity + canonical name. */
  def entityResolveQ(s: SparkSession, d: String): DataFrame =
    entityResolve(mentions(s, d), JwThreshold)
      .orderBy(col("id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_match" -> (fuzzyMatchQ _),
    "q_jaro_pairs" -> (jaroPairsQ _),
    "q_entity_resolution" -> (entityResolveQ _),
    "q_snm_pairs" -> (snmQ _),
    "q_phonetic_block" -> (phoneticBlockQ _),
  )

  val oracles: Map[String, String] = Map(
    // identical key construction: letters-only upper, the same
    // translate digit map, the per-digit run-collapse chain, zero
    // drop, first letter + rpad-3
    "q_phonetic_block" -> {
      val collapse = (0 to 6).foldLeft("c0") {
        (acc, d) => s"regexp_replace($acc, '$d$d+', '$d', 'g')"
      }
      s"""WITH b AS (
         |  SELECT unnest(string_split(lower(p_name), ' ')) AS w FROM part),
         |b2 AS (SELECT w FROM b WHERE length(w) > 1),
         |w AS (
         |  SELECT DISTINCT w FROM (
         |    SELECT w FROM b2
         |    UNION ALL SELECT replace(w, 'e', 'a') FROM b2
         |    UNION ALL SELECT substr(w, 1, 2) || substr(w, 2) FROM b2)),
         |u AS (
         |  SELECT w, upper(regexp_replace(w, '[^A-Za-z]', '', 'g')) AS u
         |  FROM w),
         |c AS (
         |  SELECT w, u,
         |    translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
         |                 '01230120022455012623010202') AS c0
         |  FROM u),
         |k AS (
         |  SELECT w,
         |    CASE WHEN length(u) > 0 THEN
         |      substr(u, 1, 1) ||
         |      rpad(substr(replace(substr($collapse, 2), '0', ''), 1, 3), 3, '0')
         |    END AS key
         |  FROM c)
         |SELECT key, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  string_agg(w, ' ' ORDER BY w) AS words
         |FROM k WHERE key IS NOT NULL
         |GROUP BY key HAVING COUNT(*) >= 2
         |ORDER BY key""".stripMargin
    },
    "q_fuzzy_match" ->
      """WITH p AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM p a JOIN p b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    // same deterministic typo model, same 3-char-prefix blocking,
    // DuckDB's own jaro_winkler_similarity — the DOUBLE itself is on
    // the wire (bit-exact kernel parity, see plans.JaroWinkler)
    "q_jaro_pairs" ->
      s"""WITH $erMentionsSql,
         |dn AS (SELECT nm, MIN(id) AS nid FROM m GROUP BY nm)
         |SELECT a.nid AS na, b.nid AS nb,
         |  jaro_winkler_similarity(a.nm, b.nm) AS sim
         |FROM dn a JOIN dn b
         |  ON lower(substr(a.nm, 1, 3)) = lower(substr(b.nm, 1, 3))
         | AND a.nid < b.nid
         |WHERE jaro_winkler_similarity(a.nm, b.nm) >= $JwThreshold
         |ORDER BY na, nb""".stripMargin,

    // edges -> recursive-CTE components (the shared CC replay
    // pattern) -> entity + canonical-name join-back
    "q_entity_resolution" ->
      s"""WITH RECURSIVE $erMentionsSql,
         |dn AS (SELECT nm, MIN(id) AS nid FROM m GROUP BY nm),
         |pr AS (
         |  SELECT a.nid AS na, b.nid AS nb
         |  FROM dn a JOIN dn b
         |    ON lower(substr(a.nm, 1, 3)) = lower(substr(b.nm, 1, 3))
         |   AND a.nid < b.nid
         |  WHERE jaro_winkler_similarity(a.nm, b.nm) >= $JwThreshold),
         |nodes AS (SELECT na AS id FROM pr UNION SELECT nb FROM pr),
         |edges AS (SELECT na AS a, nb AS b FROM pr
         |          UNION SELECT nb, na FROM pr),
         |cc(id, comp) AS (
         |  SELECT id, id AS comp FROM nodes
         |  UNION
         |  SELECT e.b AS id, cc.comp FROM cc JOIN edges e ON cc.id = e.a),
         |cm AS (SELECT id, MIN(comp) AS comp FROM cc GROUP BY id),
         |wc AS (SELECT dn.nm, dn.nid, COALESCE(cm.comp, dn.nid) AS entity
         |       FROM dn LEFT JOIN cm ON dn.nid = cm.id),
         |canon AS (SELECT entity, nm AS canonical FROM wc WHERE nid = entity)
         |SELECT m.id, wc.entity, canon.canonical
         |FROM m JOIN wc ON m.nm = wc.nm
         |       JOIN canon ON wc.entity = canon.entity
         |ORDER BY m.id""".stripMargin,

    // both passes in one long frame, the same first-char bucketed
    // (key, id) sort, w-1 = 3 LEADs, canonical pair orientation and
    // the levenshtein verify; per-pass pairs are unique by rank
    // construction so DISTINCT == the engine's per-pass dedup
    "q_snm_pairs" ->
      """WITH k0 AS (
        |  SELECT doc_id AS id,
        |    substr(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), 1, 24) AS k1
        |  FROM documents WHERE text IS NOT NULL),
        |ks AS (SELECT id, 1 AS pass, k1 AS k FROM k0
        |       UNION ALL SELECT id, 2, reverse(k1) FROM k0),
        |nb AS (
        |  SELECT pass, id, k,
        |    LEAD(id, 1) OVER wnd AS n1, LEAD(k, 1) OVER wnd AS nk1,
        |    LEAD(id, 2) OVER wnd AS n2, LEAD(k, 2) OVER wnd AS nk2,
        |    LEAD(id, 3) OVER wnd AS n3, LEAD(k, 3) OVER wnd AS nk3
        |  FROM ks
        |  WINDOW wnd AS (PARTITION BY pass, substr(k, 1, 1) ORDER BY k, id)),
        |cand AS (
        |  SELECT pass, id, n1 AS nid, k, nk1 AS nk FROM nb WHERE n1 IS NOT NULL
        |  UNION ALL SELECT pass, id, n2, k, nk2 FROM nb WHERE n2 IS NOT NULL
        |  UNION ALL SELECT pass, id, n3, k, nk3 FROM nb WHERE n3 IS NOT NULL)
        |SELECT DISTINCT CAST(pass AS BIGINT) AS pass,
        |  LEAST(id, nid) AS id_a, GREATEST(id, nid) AS id_b,
        |  CAST(levenshtein(k, nk) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(k, nk) <= 10
        |ORDER BY pass, id_a, id_b""".stripMargin,
  )

  // ---- Sorted-neighborhood blocking (SURVEY.md §2 row 196) ----------------

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo,
    * SIGMOD 1995) — the third blocking family next to length bands
    * (above) and MinHash/SimHash buckets: sort the corpus by a cheap
    * key, pair each record with its next w−1 neighbors in sort order.
    * What it uniquely catches: records whose keys are LEXICALLY close
    * without sharing a band or a shingle bucket (common-prefix typos,
    * serial-numbered variants); what it structurally misses a FIRST-
    * character divergence the multi-pass design answers — each pass
    * sorts by a different key (here the normalized prefix and its
    * reverse), and a true pair need only co-locate in ONE pass.
    *
    * Scale shape (100 TB): neighbors come from ONE window of w−1
    * `lead`s per pass — no self-join, no rank materialization, output
    * ≤ (w−1)·n per pass by construction. The window partitions by the
    * key's FIRST CHARACTER — a deterministic, data-independent bucket
    * (not a sampled range boundary), so the plan is a per-bucket sort,
    * not a global one, and the oracle can replay the bucketing
    * exactly. Pairs never cross a bucket boundary: by contract —
    * records differing in the leading character are lexically distant
    * in THIS pass's order, and the other pass re-examines them. The
    * verify (levenshtein ≤ maxDist on the pass key) runs only on the
    * ≤ (w−1)·n candidates. Pairs canonicalized (id_a < id_b); a pair
    * may surface in both passes — band semantics, deduped per pass. */
  def snmCandidates(df: DataFrame, idCol: Column, keys: Seq[Column],
                    w: Int, maxDist: Int): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    require(keys.nonEmpty, "need at least one sort-key pass")
    import org.apache.spark.sql.expressions.Window
    keys.zipWithIndex.map { case (key, p) =>
      val base = df.select(idCol.as("id"), key.as("k")).filter(col("k").isNotNull)
      val wnd = Window.partitionBy(substring(col("k"), 1, 1))
        .orderBy(col("k"), col("id"))
      // leads materialize as plain columns first — Spark disallows
      // window expressions inside a generator
      val withLeads = (1 until w).foldLeft(base) { (acc, j) =>
        acc.withColumn(s"nid_$j", lead(col("id"), j).over(wnd))
          .withColumn(s"nk_$j", lead(col("k"), j).over(wnd))
      }
      val neighbors = (1 until w).map(j =>
        struct(col(s"nid_$j").as("nid"), col(s"nk_$j").as("nk")))
      withLeads.withColumn("nb", explode(array(neighbors: _*)))
        .filter(col("nb.nid").isNotNull)
        .select(lit(p.toLong + 1L).as("pass"),
          least(col("id"), col("nb.nid")).as("id_a"),
          greatest(col("id"), col("nb.nid")).as("id_b"),
          levenshtein(col("k"), col("nb.nk")).cast(LongType).as("dist"))
        .filter(col("dist") <= maxDist)
        .dropDuplicates("pass", "id_a", "id_b")
    }.reduce(_ unionByName _)
  }

  /** §2 row 196 — two-pass SNM over documents: the 24-char normalized
    * prefix and its reverse, window 4, verify at edit distance 10. */
  def snmQ(s: SparkSession, d: String): DataFrame = {
    val key = substring(graft.functions.TextFunctions.normalize(col("text")), 1, 24)
    Fuzzy.snmCandidates(Tables.documents(s, d), col("doc_id"),
        Seq(key, reverse(key)), w = 4, maxDist = 10)
      .orderBy(col("pass"), col("id_a"), col("id_b"))
  }

  /** Mention CTE shared by both ER oracles — must mirror [[mentions]]
    * exactly (CASE arms keyed on p_partkey mod 11). A def, not a val:
    * the oracles map above captures it during object init. */
  private def erMentionsSql =
    """m AS (
      |  SELECT p_partkey AS id,
      |    CASE WHEN p_partkey % 11 = 0 THEN substr(p_name, 1, length(p_name)-1)
      |         WHEN p_partkey % 11 = 1 THEN upper(substr(p_name, 1, 1)) || substr(p_name, 2)
      |         WHEN p_partkey % 11 = 2 THEN p_name || substr(p_name, length(p_name), 1)
      |         ELSE p_name END AS nm
      |  FROM part)""".stripMargin
}
