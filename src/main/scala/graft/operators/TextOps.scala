package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions._
import graft.multimodal.Multimodal
import graft.sources.Tables

/** SURVEY.md §2.3 — text analysis, dedup and multimodal queries over the
  * `documents` corpus.
  */
object TextOps {

  /** §2.3#44 — token statistics per language. */
  def tokenCountQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), tokenCount(col("text")).as("tokens"),
        bpeEstimate(col("text")).as("bpe_est"))
      .groupBy(col("lang"))
      .agg(sum(col("tokens")).as("total_tokens"),
           (sum(col("tokens")).cast(DoubleType) / count(lit(1))).as("avg_tokens"),
           sum(col("bpe_est")).as("total_bpe"),
           count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))

  /** Stopword induction by document-frequency saturation (SURVEY.md
    * §2 row 253) — the corpus-derived stopword list quality scoring,
    * RAKE-style keyword extraction and BM25 pruning consume: a token
    * is a stopword when it appears in at least `minDfPct`% of
    * documents (doc-frequency saturation, NOT raw token counts — a
    * word repeated thousandfold in one doc is jargon, a word in 60%
    * of docs is glue). Cross-multiplied integer gate; one per-doc
    * distinct-token explode + one map-side-combined df aggregation +
    * a 1-row broadcast doc count. */
  def stopwords(docs: DataFrame, textCol: String, minDfPct: Int = 60): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(explode(array_distinct(
        graft.functions.TextFunctions.tokens(lower(col(textCol))))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .filter(col("df") * 100 >= col("n_docs") * minDfPct)
      .select(col("token"), col("df"), col("n_docs"),
        GraphOps.fdiv(col("df") * 1000000L, col("n_docs")).as("df_ppm"))
  }

  /** §2 row 253 — the corpus's own stopword list at 60% saturation. */
  def stopwordsQ(s: SparkSession, d: String): DataFrame =
    stopwords(Tables.documents(s, d), "text").orderBy(col("token"))

  /** §2.3#43 — per-document quality components + score. */
  def qualityScoreQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        alphaRatio(col("text")).as("alpha_ratio"),
        digitRatio(col("text")).as("digit_ratio"),
        spaceRatio(col("text")).as("space_ratio"),
        tokenCount(col("text")).as("tokens"),
        qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** §2 row 108 — compression-ratio quality signal: `n_bytes /
    * deflate_len` per document (graft.plans.DeflateLen, raw DEFLATE
    * level 6). High ratio = template/boilerplate/repetitive spam; the
    * MassiveText-style cut keeps documents whose ratio stays under a
    * threshold. Registered rows-only (SURVEY §5): zlib is
    * deterministic per build but not replayable ANSI SQL — the same
    * posture as the HLL and quantile sketches. The keep verdict at
    * 4.0 complements q_repetition's word-level rules: DEFLATE sees
    * repeated STRUCTURE (byte n-grams) that word histograms miss. */
  def compressRatioQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        graft.plans.DeflateLen.deflate_len(col("text"), 6).as("deflate_len"))
      .withColumn("ratio",
        col("n_bytes").cast(DoubleType) /
          greatest(col("deflate_len").cast(DoubleType), lit(1d)))
      .withColumn("keep", col("ratio") <= 4.0)
      .orderBy(col("doc_id"))

  /** §2.3#42 — language-ID confusion counts vs the labeled lang. */
  def langIdQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), langId(col("text")).as("predicted_lang"))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted_lang"))

  /** §2.3#45 — shingle fingerprint: min md5 over distinct 3-gram
    * shingles (a 1-permutation MinHash — collision-stable doc identity). */
  def fingerprintQ(s: SparkSession, d: String): DataFrame =
    // Exploded codegen'd shingles + one grouped agg. MIN over the
    // multiset equals MIN over the distinct set, so the oracle
    // (explode + MIN over distinct shingles) agrees.
    shingleRows(Tables.documents(s, d), Seq(col("doc_id")), col("text"))
      .groupBy(col("doc_id"))
      .agg(min(md5(col("sh"))).as("fingerprint"),
           countDistinct(col("sh")).as("n_shingles"))
      .orderBy(col("doc_id"))

  /** §2.3#37 — exact n-gram Jaccard via prefix-filtered candidates
    * (All-Pairs/PPJoin prefix scheme, Bayardo et al. WWW'07).
    *
    * Shingle sets are hashed to longs (set semantics preserved, 2^-64
    * collision odds); if J(A,B) >= t then A and B must share an element
    * inside their first (n - ceil(t*n) + 1) elements under ANY fixed
    * total order — proof: the smallest common element c (in that order)
    * has all >= t*max(|A|,|B|) common elements above it, which cannot
    * fit in either suffix. The theorem licenses choosing the order for
    * selectivity, and the canonical choice is ascending GLOBAL DOCUMENT
    * FREQUENCY: prefixes then hold each doc's rarest shingles, so a
    * candidate pair must share a rare shingle. Hash order (a random
    * permutation) lets corpus-common shingles land in prefixes and fan
    * out candidates — on a skewed corpus (one shingle in 50% of docs)
    * that degenerates toward n²; df order caps each prefix hash's fan
    * out at its df. One extra grouped agg computes df; ties broken by
    * hash for determinism. The equi-join carries ids only; hash arrays
    * are attached to the deduped candidate ids afterwards, so no array
    * ever rides through a shuffle twice. */
  def ngramJaccardQ(s: SparkSession, d: String): DataFrame =
    ngramJaccard(Tables.documents(s, d))

  /** Per-doc RARE-FIRST shingle-hash sets — the shared prelude of
    * [[ngramJaccard]] and [[containmentPairs]] (one copy so their
    * hashing, df tie-break and prefix arithmetic cannot drift).
    * Distinct (carry, shingle-hash) pairs from ONE shingling pass; df
    * attached with a window over h (post-distinct, count per
    * h-partition) rather than a groupBy+self-join, which would
    * re-derive the exploded table on the second branch (Spark does not
    * dedupe common subplans — measured ~2x slower). ONE grouped agg
    * then builds each doc's set ordered rare-first: sort_array over
    * struct(df, h) sorts lexicographically, .getField("h")
    * (GetArrayStructFields, codegen'd) strips the df key so the stored
    * set is a plain array<long> — the same array serves the prefix
    * slice AND the exact verify, and array_intersect keeps its
    * primitive fast path (on structs it degrades to a quadratic scan,
    * measured 6x slower end-to-end). Persisted: the sets feed three
    * consumers (prefix explode + both attach joins). */
  private def rareFirstSets(docs: DataFrame, carry: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uniq = shingleRows(docs, carry, col("text"))
      .select(carry :+ xxhash64(col("sh")).as("h"): _*)
      .distinct()
    uniq.withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .groupBy(carry: _*)
      .agg(sort_array(collect_set(struct(col("df"), col("h"))))
        .getField("h").as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Prefix length for threshold t over a set of size |hs|: keeping
    * the first |hs| − ceil(t·|hs|) + 1 elements guarantees (pigeonhole)
    * that any counterpart reaching overlap ≥ ceil(t·|hs|) shares at
    * least one of them — for ANY prefix order. */
  private def prefLen(t: Double): Column =
    (size(col("hs")) - ceil(size(col("hs")) * t) + 1).cast(IntegerType)

  /** Operator form over any frame with (doc_id, n_chars, text) —
    * exposed so the scaling probe (`graft.ScaleProbe`) can drive it on
    * replicated corpora. */
  def ngramJaccard(docs: DataFrame): DataFrame = {
    val t = 0.5
    val sh = rareFirstSets(docs, Seq(col("doc_id"), col("n_chars")))
    val pref = sh.select(col("doc_id"), col("n_chars"),
      explode(slice(col("hs"), lit(1), prefLen(t))).as("h"))
    val a = pref.select(col("h"), col("doc_id").as("doc_a"), col("n_chars").as("nc_a"))
    val b = pref.select(col("h").as("h_b"), col("doc_id").as("doc_b"), col("n_chars").as("nc_b"))
    val candIds = a.join(b,
        col("h") === col("h_b") && col("doc_a") < col("doc_b") &&
        abs(col("nc_a") - col("nc_b")) <= 8)
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    candIds
      .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (size(col("hs_a")) + size(col("hs_b")) - col("inter")))
      .filter(col("jaccard") >= t)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Asymmetric shingle CONTAINMENT pairs (SURVEY.md §2 row 117):
    * (id_a, id_b, containment) where |S_a ∩ S_b| / |S_a| >= t — the
    * quote/subset detector symmetric Jaccard structurally misses (a
    * 200-word excerpt inside a 20k-word page has Jaccard ≈ 0.01 but
    * containment 1.0; dedup literature treats these as distinct
    * relations for exactly this reason). Directional: a is the
    * contained side, and a pair can appear in both directions.
    *
    * Scale shape: the [[ngramJaccard]] prefix-filter layout with the
    * contained side pruned and the container side FULL — if no element
    * of a's (|A| - ceil(t·|A|) + 1)-element prefix hits B, the overlap
    * is at most ceil(t·|A|) - 1 < t·|A| (pigeonhole), so prefix×full
    * loses no true pair REGARDLESS of prefix order; rare-first
    * ordering (df, then hash) is pure fan-out control. No n_chars
    * blocking: size asymmetry is the point here. Ids only through the
    * candidate shuffle; arrays attach after dedup. */
  def containmentPairs(docs: DataFrame, t: Double): DataFrame = {
    require(t > 0d && t <= 1d, s"containment threshold must be in (0,1], got $t")
    val sh = rareFirstSets(docs, Seq(col("doc_id")))
    val pref = sh.select(col("doc_id").as("id_a"),
      explode(slice(col("hs"), lit(1), prefLen(t))).as("h"))
    val full = sh.select(col("doc_id").as("id_b"), explode(col("hs")).as("h"))
    val candIds = pref.join(full, Seq("h"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    candIds
      .join(sh.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("containment",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast(DoubleType) /
          size(col("hs_a")).cast(DoubleType))
      .filter(col("containment") >= t)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** §2 row 117 — containment pairs at t = 0.8. */
  def containmentQ(s: SparkSession, d: String): DataFrame =
    containmentPairs(Tables.documents(s, d), t = 0.8)
      .orderBy(col("id_a"), col("id_b"))

  /** Weighted (multiset) Jaccard pair verification (SURVEY.md §2 row
    * 175) — Σ_t min(c_a, c_b) / Σ_t max(c_a, c_b) over TOKEN COUNTS:
    * the repetition-aware relation set Jaccard is blind to ("a a a b"
    * vs "a b" score 1.0 on sets, 2/4 here — loop-y spam and its clean
    * source separate on multiplicity, not vocabulary; Ioffe 2010
    * treats weighted Jaccard as its own relation for this reason).
    * Emits the exact integer pair (wj_num, wj_den): num = Σ min over
    * shared tokens, den = len_a + len_b − num (the Σ max identity —
    * only the SHARED-token join is ever computed; per-doc totals cover
    * the rest), divide at display. wj_den = 0 only for two token-free
    * docs — kept explicit, the kappa posture.
    *
    * Scale shape: scoring rides an EXISTING candidate relation (here
    * row 33's set-Jaccard near-dups) — never all pairs; the tf frame
    * is one map-side-combined groupBy of the corpus, the shared-token
    * intersection is two equi-joins keyed (doc, token) whose fan-out
    * is bounded by |pairs| × doc length, and the num aggregation
    * combines map-side. The tf witness is restricted to PAIR-
    * PARTICIPATING docs before it is built (semi-join on the pair id
    * set): only candidates are ever scored, so only their term
    * vectors belong in the persisted frame — at 100 TB the candidate
    * set is a small fraction of the corpus, and persisting corpus-
    * wide tf was the memory-pressure cliff the round-11 driver bench
    * exposed (28 s vs 2.7 s on the same commit). pairs persists too
    * (three consumers: the id set + the join spine + the left join). */
  def weightedJaccard(docs: DataFrame, idCol: String, textCol: String,
                      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val p = pairs.select(col(aCol).as("doc_a"), col(bCol).as("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ids = p.select(col("doc_a").as("__id"))
      .unionByName(p.select(col("doc_b").as("__id"))).distinct()
    val tf = docs.join(ids, col(idCol) === ids("__id"), "left_semi")
      .select(col(idCol).as("__id"),
        explode(regexp_extract_all(col(textCol), lit("[A-Za-z0-9]+"), lit(0))).as("token"))
      .groupBy(col("__id"), col("token")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lens = tf.groupBy(col("__id")).agg(sum(col("c")).as("l"))
    val inter = p
      .join(tf.select(col("__id").as("doc_a"), col("token"), col("c").as("ca")), "doc_a")
      .join(tf.select(col("__id").as("doc_b"), col("token"), col("c").as("cb")),
        Seq("doc_b", "token"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(least(col("ca"), col("cb"))).as("n"))
    p.join(inter, Seq("doc_a", "doc_b"), "left")
      .join(lens.select(col("__id").as("doc_a"), col("l").as("la")), Seq("doc_a"), "left")
      .join(lens.select(col("__id").as("doc_b"), col("l").as("lb")), Seq("doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("n"), lit(0L)).as("wj_num"),
        (coalesce(col("la"), lit(0L)) + coalesce(col("lb"), lit(0L)) -
          coalesce(col("n"), lit(0L))).as("wj_den"))
  }

  /** §2 row 175 — the set-Jaccard near-dup pairs rescored by token
    * multiplicity. */
  def weightedJaccardQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    weightedJaccard(docs, "doc_id", "text",
        ngramJaccard(docs), "doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** §2.3#34 — exact dedup groups (md5 hash-groupBy). */
  def dedupExactQ(s: SparkSession, d: String): DataFrame =
    Dedup.exactGroups(Tables.documents(s, d), col("text"), col("doc_id"))
      .orderBy(col("h"))

  /** §2.3#35 — normalized exact dedup groups. */
  def dedupNormQ(s: SparkSession, d: String): DataFrame =
    Dedup.exactNormalizedGroups(Tables.documents(s, d), col("text"), col("doc_id"))
      .orderBy(col("h"))

  /** §2.3#36 — MinHash-LSH near-dups. Oracle-backed, probabilistically:
    * with 16 bands of 2 permutations a pair at jaccard j is missed with
    * probability (1-j²)^16 — measured across the corpus: every true
    * pair is ≥ 0.9 at sf0.01 (miss = 0.19^16 ≈ 2.9e-12) and ≥ 0.8 at sf0.1
    * (miss ≤ 8.5e-8), with nothing in [0.3, 0.8), so the worst
    * borderline exposure ~1e-2 at exactly j=0.5 never arises — and the
    * exact-Jaccard verify removes every false positive. So the output
    * EQUALS the exact pairwise-Jaccard join DuckDB computes, up to that
    * per-pair miss probability: if a future corpus regeneration ever
    * shows a q_dedup_minhash row-count mismatch of 1, check the missing
    * pair's jaccard against this math before debugging code. 16x2
    * (vs round-3's 32x1) keeps the false-candidate rate at background
    * j≈0.1 to 1-(1-0.01)^16 ≈ 15% instead of 97% — the all-pairs cliff
    * that made 32x1 a 100 TB scale-killer. The library default (8x4)
    * stays for the recall-vs-cost trade at scale; DedupSpec covers it. */
  def dedupMinhashQ(s: SparkSession, d: String): DataFrame =
    Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
        numPerm = 32, bands = 16)
      .orderBy(col("id_a"), col("id_b"))

  /** §2.3#38 — SimHash near-dups. Oracle-backed and EXACT (not
    * probabilistic): 4 bands of 16 bits find every pair at hamming <= 3
    * by pigeonhole (3 differing bits cannot touch all 4 bands), and the
    * verify keeps only hamming <= 3 — so the banded output equals the
    * all-pairs hamming join the oracle computes, which replays the
    * PolyHash64 → ±1 votes → sign-bit pipeline in HUGEINT. */
  def dedupSimhashQ(s: SparkSession, d: String): DataFrame =
    Dedup.simhashNearDups(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))

  /** §2.3#46 — multimodal metadata plumbing (stubbed decode). */
  def multimodalMetaQ(s: SparkSession, d: String): DataFrame =
    Multimodal.withMetadata(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** §2.3#46 — resize metadata: aspect-preserving fit into 224x224 over
    * the stubbed decode dims (pure arithmetic — oracle-checked). */
  def multimodalResizeQ(s: SparkSession, d: String): DataFrame =
    Multimodal.withResize(
        Multimodal.withMetadata(Tables.documents(s, d), "doc_id", "text"), 224)
      .select(col("doc_id"), col("width"), col("height"), col("out_w"), col("out_h"))
      .orderBy(col("doc_id"))

  /** §2.12 (SURVEY.md §2 row 142) — canonical-representative selection:
    * resolve the MinHash near-dup pairs into clusters (connected
    * components) and keep ONE doc per cluster by quality — argmax
    * (qualityScore DESC, doc_id ASC), the production alternative to
    * keep-first/keep-min (which keeps whatever document happened to get
    * the smallest id, not the best copy). Output is the per-cluster
    * decision record: (comp, keep_id, quality, n_members).
    *
    * Scale shape: pairs and CC are the existing banded/star-capped
    * paths; the selection itself is ONE aggregation over the O(dups)
    * membership frame — argmax via max(struct(q, -id)), no per-cluster
    * window, so a pathological mega-cluster costs a wide hash
    * aggregate, not a single-task sort. Quality is the fixed-order
    * double composition q_quality_score already proves replayable. */
  /** Per-cluster argmax selection: `cc` is a component map (id, comp),
    * `quality` scores every doc (doc_id, q). Ties on q break to the
    * SMALLER doc_id, so the result is total-order deterministic. */
  def keepBestPerCluster(cc: DataFrame, quality: DataFrame): DataFrame =
    cc.join(quality, cc("id") === quality("doc_id"))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("q"), (-col("doc_id")).as("nid"))).as("m"))
      .select(col("comp"), (-col("m.nid")).as("keep_id"),
        col("m.q").as("quality"), col("n_members"))

  def keepBestQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      numPerm = 32, bands = 16)
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val dq = docs.select(col("doc_id"),
      qualityScore(col("text")).as("q"))
    keepBestPerCluster(cc, dq).orderBy(col("comp"))
  }

  /** Golden-record survivorship (SURVEY.md §2 row 197) — the MDM
    * field-merge step AFTER clustering: row 140's keep-best selects
    * one whole RECORD per duplicate cluster, but the canonical
    * metadata is a per-FIELD vote (three crawls of the same page may
    * each carry the right value for a different field — pick the
    * record and you inherit its wrong fields too). Per (cluster,
    * field): the most frequent non-NULL value survives, frequency
    * ties break to the SMALLEST value (total-order deterministic);
    * NULLs don't vote (absent evidence, the kappa posture) and a
    * field with zero non-NULL votes emits NO row. Each survivor
    * carries its support count, the distinct-value count (the field's
    * intra-cluster DISAGREEMENT — the data-quality signal
    * survivorship normally hides) and the cluster size. Singleton
    * docs are already golden and are excluded by contract: the
    * operator's domain is the duplicate clusters.
    *
    * Scale shape (100 TB): records join the O(dups) component map
    * first, so everything downstream is cluster-bounded; ONE explode
    * melts the fixed field list (rows = members × |fields|); one
    * map-side-combined (comp, field, value) count; the winner is a
    * min(struct(-cnt, value)) argmax — no window, no sort; members
    * and distinct counts ride the same bounded frames. */
  def goldenRecords(records: DataFrame, idCol: String, cc: DataFrame,
                    fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one survivorship field")
    val mem = records.join(cc, records(idCol) === cc("id"))
      .select(col("comp") +: fields.map(f => col(f).cast(StringType).as(f)): _*)
    val members = cc.groupBy(col("comp")).agg(count(lit(1)).as("n_members"))
    val melted = mem.select(col("comp"), explode(array(fields.map(f =>
        struct(lit(f).as("field"), col(f).as("value"))): _*)).as("fv"))
      .select(col("comp"), col("fv.field").as("field"), col("fv.value").as("value"))
      .filter(col("value").isNotNull)
    val counts = melted.groupBy(col("comp"), col("field"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("comp"), col("field"))
      .agg(min(struct((-col("cnt")).as("nc"), col("value").as("v"))).as("m"),
        count(lit(1)).as("n_distinct"))
      .join(members, Seq("comp"))
      .select(col("comp"), col("field"), col("m.v").as("value"),
        (-col("m.nc")).as("n_support"), col("n_distinct"), col("n_members"))
  }

  /** Dedup savings report (SURVEY.md §2 row 208) — the capacity-
    * planning view of the duplicate clusters rows 36/140/197 operate
    * on: BEFORE running a destructive dedup at 100 TB, the operative
    * numbers are "how many clusters of each size, how many redundant
    * documents, how many bytes does keeping one canonical per cluster
    * actually reclaim?" (cluster-size distributions are heavy-tailed;
    * one 10k-member template cluster dominates the savings and this
    * table is where it shows). Canonical = the min-id member (the
    * component id itself — the deterministic choice every CC consumer
    * here shares); saved chars = Σ chars − canonical's chars per
    * cluster, rolled up by cluster SIZE. Singletons are not clusters
    * and never enter (component maps only materialize paired docs).
    *
    * Scale shape: documents join the O(dups) component map first;
    * ONE per-cluster aggregate (count, Σ chars, min(struct(id,
    * chars)) argmin — no window), ONE size rollup over the cluster-
    * bounded frame. */
  def dedupSavings(records: DataFrame, idCol: String, charsCol: String,
                   cc: DataFrame): DataFrame = {
    val mem = records.join(cc, records(idCol) === cc("id"))
      .select(cc("comp"), records(idCol).as("__id"),
        records(charsCol).cast(LongType).as("__chars"))
    mem.groupBy(col("comp"))
      .agg(count(lit(1)).as("size"), sum(col("__chars")).as("chars_total"),
        min(struct(col("__id").as("i"), col("__chars").as("c"))).as("keep"))
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n_clusters"),
        (sum(col("size"))).as("n_docs"),
        sum(col("size") - 1L).as("n_redundant"),
        sum(col("chars_total")).as("chars_total"),
        sum(col("chars_total") - col("keep.c")).as("chars_saved"))
  }

  /** Cluster-density audit (SURVEY.md §2 row 211) — the connected-
    * components OVERMERGE detector: CC is transitive, so one borderline
    * pair chains two genuinely-distinct near-dup groups into a single
    * cluster, and a destructive dedup then deletes documents that were
    * never duplicates of the kept canonical. Density separates the
    * cases — a true duplicate group is near-clique (every member pairs
    * with every member), a chain-merge is near-tree (m ≈ n−1, the
    * MINIMUM that keeps it connected). Per cluster: nodes, distinct
    * verified edges, density as the integer pair (2m, n(n−1)), is_tree
    * (m = n−1 — review before deleting) and is_clique flags. Size-2
    * clusters are trees AND cliques — both flags true, the honest
    * degenerate.
    *
    * Scale shape: edges carry their component via ONE equi-join on an
    * endpoint (both endpoints share the comp by construction); one
    * map-side edge count + one node count per comp; one comp-bounded
    * join. */
  def clusterDensity(pairs: DataFrame, aCol: String, bCol: String,
                     cc: DataFrame): DataFrame = {
    val e = pairs.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .dropDuplicates("__a", "__b")
    val ec = e.join(cc, e("__a") === cc("id"))
      .groupBy(col("comp")).agg(count(lit(1)).as("n_edges"))
    val nc = cc.groupBy(col("comp")).agg(count(lit(1)).as("n_nodes"))
    nc.join(ec, Seq("comp"), "left")
      .withColumn("n_edges", coalesce(col("n_edges"), lit(0L)))
      .select(col("comp"), col("n_nodes"), col("n_edges"),
        (col("n_edges") * 2L).as("density_num"),
        (col("n_nodes") * (col("n_nodes") - 1L)).as("density_den"),
        (col("n_edges") === col("n_nodes") - 1L).as("is_tree"),
        (col("n_edges") * 2L === col("n_nodes") * (col("n_nodes") - 1L))
          .as("is_clique"))
  }

  /** Cross-source duplication matrix (SURVEY.md §2 row 220) — the
    * PROVENANCE view of the near-dup pair relation: which sources copy
    * from which. A heavy off-diagonal cell means one source mirrors
    * another (keep one, or weight the mixture down); a heavy diagonal
    * means a source re-publishes itself (template churn). This is the
    * table that decides whether dedup should run per-source or
    * globally — per-source dedup is cheaper but silently keeps every
    * cross-source copy the off-diagonal counts here. Pairs are
    * unordered: the cell key is (min, max) by source name, so A→B and
    * B→A accumulate together.
    *
    * Scale shape: the verified pair relation (ids only) joins the
    * (id → source) projection twice — both joins key on doc id;
    * the matrix groupBy rides a \|sources\|²-bounded space. */
  def crossSourceDups(pairs: DataFrame, aCol: String, bCol: String,
                      docs: DataFrame, idCol: String, srcCol: String): DataFrame = {
    val m = docs.select(col(idCol).as("__id"), col(srcCol).as("__src"))
    pairs.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .join(m.select(col("__id").as("__a"), col("__src").as("sa")), Seq("__a"))
      .join(m.select(col("__id").as("__b"), col("__src").as("sb")), Seq("__b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** §2 row 220 — the minhash pair relation by source pair. */
  def crossSourceDupsQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      numPerm = 32, bands = 16)
    crossSourceDups(pairs, "id_a", "id_b", docs, "doc_id", "source")
      .orderBy(col("source_a"), col("source_b"))
  }

  /** §2 row 211 — density of the minhash duplicate clusters. `pairs`
    * is persisted: it feeds BOTH the component labeling and the
    * density pair-count — unpinned, the band join + Jaccard verify
    * executes once per consumer (the signature state below it is
    * already cached by minhashNearDups, but the candidate join is the
    * expensive half). */
  def clusterDensityQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        numPerm = 32, bands = 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    clusterDensity(pairs, "id_a", "id_b", cc).orderBy(col("comp"))
  }

  /** §2 row 208 — savings over the minhash duplicate clusters. */
  def dedupSavingsQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      numPerm = 32, bands = 16)
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    dedupSavings(docs, "doc_id", "n_chars", cc).orderBy(col("size"))
  }

  /** §2 row 197 — survivorship over the minhash duplicate clusters:
    * lang, source and the 100-char length bucket as voted fields. */
  def goldenQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      numPerm = 32, bands = 16)
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val recs = docs.select(col("doc_id"), col("lang"), col("source"),
      floor(col("n_chars") / lit(100)).cast(LongType).cast(StringType).as("len_bucket"))
    goldenRecords(recs, "doc_id", cc, Seq("lang", "source", "len_bucket"))
      .orderBy(col("comp"), col("field"))
  }

  /** §2.12 (SURVEY.md §2 row 143) — leakage-safe train/val/test split:
    * hash the near-dup CLUSTER id, not the document id. A doc-level
    * deterministic split (row 73) lets two near-duplicates land in
    * train and test — the eval set then contains soft copies of
    * training documents, the contamination the decon rows exist to
    * prevent, re-introduced by the splitter itself. Here every member
    * of a connected component shares the component-min id, so the
    * whole cluster moves as one unit; singletons (docs in no pair)
    * keep their own id — for them the assignment degenerates to the
    * doc-level split, as it should.
    *
    * Scale shape: pairs/CC as in q_keep_best; the assignment itself is
    * a pure projection over docs LEFT JOIN the O(dups) component map —
    * no new shuffle beyond the join on doc_id. */
  /** Cluster-keyed deterministic split assignment: every doc hashes on
    * its component id (own id for singletons), so a near-dup cluster
    * can never straddle splits. `docs` needs the id column only. */
  def clusterSplit(docs: DataFrame, idCol: String, cc: DataFrame): DataFrame = {
    val ids = docs.select(col(idCol))
    ids.join(cc, ids(idCol) === cc("id"), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("comp"))
      .withColumn("bucket",
        TrainingOps.splitBucket(col("comp"), prefix = "csplit|"))
      .withColumn("split", TrainingOps.splitOf(col("bucket")))
  }

  def clusterSplitQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      numPerm = 32, bands = 16)
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    clusterSplit(docs, "doc_id", cc).orderBy(col("doc_id"))
  }

  /** §2.12 (SURVEY.md §2 row 145) — per-document n-gram novelty: the
    * fraction of a doc's distinct 3-gram shingles whose FIRST corpus
    * occurrence (min doc_id over containing docs) is the doc itself —
    * the curation signal that separates novel content from recombined
    * boilerplate (a doc pasted together from earlier docs scores ~0
    * even when no single source passes a near-dup threshold; dedup
    * rows 34-38 cannot see this).
    *
    * Scale shape: text reduces to (doc_id, shingle-HASH) immediately —
    * ids+hash only through every shuffle. First-occurrence is a
    * whole-partition window min on the hash (one exchange, no
    * groupBy+join back), then one per-doc aggregation. Novelty is the
    * integer floor-div percentage — no doubles. Collision caveat: two
    * shingles sharing a 64-bit hash collapse into one novelty unit;
    * the oracle replays the same hashes, so collisions replay exactly.
    */
  /** Per-doc DISTINCT "nov|"-prefixed 3-gram shingle hashes — the
    * (__id, h) projection every novelty path shares (the direct score
    * below and [[NoveltyState]]'s persisted first-seen state), so the
    * hash streams cannot drift between them. */
  private[operators] def docShingleHashes(docs: DataFrame, idCol: String,
                                          textCol: String): DataFrame =
    shingleRows(
        docs.select(col(idCol).as("__id"), col(textCol).as("__t")),
        Seq(col("__id")), col("__t"), n = 3, out = "sh")
      .select(col("__id"),
        graft.plans.PolyHash64.poly_hash64(concat(lit("nov|"), col("sh"))).as("h"))
      .distinct()

  def noveltyScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dh = docShingleHashes(docs, idCol, textCol)
    val w = Window.partitionBy(col("h"))
    dh.withColumn("first_id", min(col("__id")).over(w))
      .groupBy(col("__id").as("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") === col("__id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_pct",
        GraphOps.fdiv(lit(100L) * col("n_novel"), col("n_shingles")))
  }

  /** §2.12 — novelty over `documents` in doc_id order. */
  def noveltyQ(s: SparkSession, d: String): DataFrame =
    noveltyScores(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stopwords"       -> (stopwordsQ _),
    "q_keep_best"       -> (keepBestQ _),
    "q_golden_record"   -> (goldenQ _),
    "q_dedup_savings"   -> (dedupSavingsQ _),
    "q_cluster_density" -> (clusterDensityQ _),
    "q_cross_source_dups" -> (crossSourceDupsQ _),
    "q_cluster_split"   -> (clusterSplitQ _),
    "q_novelty"         -> (noveltyQ _),
    "q_token_count"     -> (tokenCountQ _),
    "q_quality_score"   -> (qualityScoreQ _),
    "q_compress_ratio"  -> (compressRatioQ _),
    "q_lang_id"         -> (langIdQ _),
    "q_fingerprint"     -> (fingerprintQ _),
    "q_ngram_jaccard"   -> (ngramJaccardQ _),
    "q_containment"     -> (containmentQ _),
    "q_weighted_jaccard" -> (weightedJaccardQ _),
    "q_dedup_exact"     -> (dedupExactQ _),
    "q_dedup_norm"      -> (dedupNormQ _),
    "q_dedup_minhash"   -> (dedupMinhashQ _),
    "q_dedup_simhash"   -> (dedupSimhashQ _),
    "q_multimodal_meta" -> (multimodalMetaQ _),
    "q_multimodal_resize" -> (multimodalResizeQ _),
    "q_frame_schedule" -> ((s: SparkSession, d: String) =>
      Multimodal.frameSchedule(Tables.documents(s, d), "doc_id", "text", k = 8)
        .orderBy(col("doc_id"), col("frame_idx"))),
  )

  private val shingleSql =
    """SELECT doc_id, n_chars,
      |    list_distinct(list_transform(range(1, len(ws)-1),
      |      i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh
      |  FROM (SELECT doc_id, n_chars,
      |          regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
      |        FROM documents) w
      |  WHERE len(ws) >= 3""".stripMargin

  /** Full-corpus novelty replay; `finalWhere` restricts the OUTPUT
    * rows only (first occurrences stay corpus-global) — shared with
    * NoveltyState's incremental gate, whose state-fed batch scores
    * must equal exactly this, restricted to the batch. */
  private[operators] def noveltySql(finalWhere: String = ""): String =
    s"""WITH s AS ($shingleSql),
       |ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
       |gv AS (SELECT DISTINCT g FROM ex),
       |hs AS (${TrainingOps.polyHashSql("nov|", "gv", "g")}),
       |dh AS (SELECT DISTINCT ex.doc_id, hs.h FROM ex JOIN hs ON ex.g = hs.g),
       |fo AS (SELECT h, MIN(doc_id) AS fid FROM dh GROUP BY h),
       |agg AS (
       |  SELECT dh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |    CAST(SUM(CASE WHEN fo.fid = dh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
       |  FROM dh JOIN fo ON dh.h = fo.h
       |  GROUP BY dh.doc_id)
       |SELECT doc_id, n_shingles, n_novel,
       |  CAST((100 * n_novel) // n_shingles AS BIGINT) AS novelty_pct
       |FROM agg $finalWhere ORDER BY doc_id""".stripMargin

  /** Shared oracle prelude: minhash-parity near-dup pairs (j >= 0.5,
    * the q_dedup_minhash relation) resolved into a component map `cm`
    * by the recursive min-reachable-id fixpoint — used verbatim by the
    * q_keep_best and q_cluster_split oracles so the two cannot drift.
    * Callers must open with WITH RECURSIVE. */
  private val componentMapSql =
    s"""s AS ($shingleSql),
       |ex AS (SELECT doc_id, unnest(sh) AS t FROM s),
       |sz AS (SELECT doc_id, len(sh) AS n FROM s),
       |ic AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
       |       FROM ex a JOIN ex b ON a.t = b.t AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2),
       |pr AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT ic.id_a, ic.id_b,
       |      CAST(ic.c AS DOUBLE) / (sa.n + sb.n - ic.c) AS jaccard
       |    FROM ic JOIN sz sa ON sa.doc_id = ic.id_a
       |            JOIN sz sb ON sb.doc_id = ic.id_b) p
       |  WHERE jaccard >= 0.5),
       |nodes AS (SELECT id_a AS id FROM pr UNION SELECT id_b FROM pr),
       |edges AS (SELECT id_a AS a, id_b AS b FROM pr UNION SELECT id_b, id_a FROM pr),
       |cc(id, comp) AS (
       |  SELECT id, id AS comp FROM nodes
       |  UNION
       |  SELECT e.b AS id, cc.comp FROM cc JOIN edges e ON cc.id = e.a),
       |cm AS (SELECT id, MIN(comp) AS comp FROM cc GROUP BY id)""".stripMargin

  val oracles: Map[String, String] = Map(
    // distinct tokens per doc (list_distinct over the shared token
    // regex), df aggregation, the cross-multiplied saturation gate,
    // ppm floor division
    "q_stopwords" ->
      """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |tf AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    regexp_extract_all(lower(text), '[A-Za-z0-9]+', 0))) AS token
        |  FROM documents),
        |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token)
        |SELECT token, df, n.n_docs, df * 1000000 // n.n_docs AS df_ppm
        |FROM df, n
        |WHERE df * 100 >= n.n_docs * 60
        |ORDER BY token""".stripMargin,

    "q_token_count" ->
      """SELECT lang,
        |  CAST(SUM(tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
        |  CAST(SUM(bpe_est) AS BIGINT) AS total_bpe,
        |  COUNT(*) AS n_docs
        |FROM (SELECT lang,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS BIGINT) AS tokens,
        |    CAST(CEIL(length(text) / 4.0) AS BIGINT) AS bpe_est
        |  FROM documents) t
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "q_quality_score" ->
      """SELECT doc_id,
        |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) AS alpha_ratio,
        |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) AS digit_ratio,
        |  CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) AS space_ratio,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS BIGINT) AS tokens,
        |  0.6 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1))
        |    + 0.4 * (CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) AS quality
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH c AS (SELECT lang,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in)\b', 0)) AS c_en,
        |    len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|en)\b', 0)) AS c_es,
        |    len(regexp_extract_all(lower(text), '\b(der|die|und|ist|das)\b', 0)) AS c_de,
        |    len(regexp_extract_all(lower(text), '\b(le|les|des|et|dans)\b', 0)) AS c_fr
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
        |       WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
        |       WHEN c_de >= c_fr THEN 'de'
        |       ELSE 'fr' END AS predicted_lang,
        |  COUNT(*) AS n
        |FROM c
        |GROUP BY 1, 2
        |ORDER BY lang, predicted_lang""".stripMargin,

    "q_fingerprint" ->
      s"""SELECT doc_id, MIN(md5(sh)) AS fingerprint, COUNT(*) AS n_shingles
         |FROM (
         |  SELECT doc_id, UNNEST(sh) AS sh FROM ($shingleSql) s) u
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // Sparse all-pairs (round 6): explode the shingle sets and count
    // intersections through an equi-join — only pairs sharing >= 1
    // shingle are ever scored, and a zero-overlap pair can't reach any
    // positive threshold, so the output is IDENTICAL to the dense
    // cross-product form while DuckDB runs it ~260x faster at sf0.1
    // (the jaccard double is the same c/(na+nb-c) division on the same
    // integers).
    "q_ngram_jaccard" ->
      s"""WITH s AS ($shingleSql),
         |ex AS (SELECT doc_id, unnest(sh) AS t FROM s),
         |sz AS (SELECT doc_id, n_chars, len(sh) AS n FROM s),
         |ic AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
         |       FROM ex a JOIN ex b ON a.t = b.t AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT ic.id_a AS doc_a, ic.id_b AS doc_b,
         |    CAST(ic.c AS DOUBLE) / (sa.n + sb.n - ic.c) AS jaccard
         |  FROM ic JOIN sz sa ON sa.doc_id = ic.id_a
         |          JOIN sz sb ON sb.doc_id = ic.id_b
         |  WHERE abs(sa.n_chars - sb.n_chars) <= 8) p
         |WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // the q_ngram_jaccard pair relation verbatim (same CTEs), then
    // token-count multisets joined on shared tokens; num/den replayed
    // in HUGEINT and emitted BIGINT — LEFT joins keep the pair spine
    // under zero-overlap/token-free edge cases, like the engine
    "q_weighted_jaccard" ->
      s"""WITH s AS ($shingleSql),
         |ex AS (SELECT doc_id, unnest(sh) AS t FROM s),
         |sz AS (SELECT doc_id, n_chars, len(sh) AS n FROM s),
         |ic AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
         |       FROM ex a JOIN ex b ON a.t = b.t AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2),
         |pr AS (SELECT doc_a, doc_b FROM (
         |  SELECT ic.id_a AS doc_a, ic.id_b AS doc_b,
         |    CAST(ic.c AS DOUBLE) / (sa.n + sb.n - ic.c) AS jaccard
         |  FROM ic JOIN sz sa ON sa.doc_id = ic.id_a
         |          JOIN sz sb ON sb.doc_id = ic.id_b
         |  WHERE abs(sa.n_chars - sb.n_chars) <= 8) p
         |  WHERE jaccard >= 0.5),
         |tf AS (SELECT doc_id, token, COUNT(*) AS c FROM (
         |    SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS token
         |    FROM documents) u
         |  GROUP BY 1, 2),
         |ln AS (SELECT doc_id, SUM(c) AS l FROM tf GROUP BY 1),
         |it AS (SELECT p.doc_a, p.doc_b, SUM(LEAST(a.c, b.c)) AS n
         |       FROM pr p JOIN tf a ON a.doc_id = p.doc_a
         |               JOIN tf b ON b.doc_id = p.doc_b AND b.token = a.token
         |       GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(COALESCE(it.n, 0) AS BIGINT) AS wj_num,
         |  CAST(COALESCE(la.l, 0) + COALESCE(lb.l, 0) - COALESCE(it.n, 0) AS BIGINT) AS wj_den
         |FROM pr p
         |LEFT JOIN it ON it.doc_a = p.doc_a AND it.doc_b = p.doc_b
         |LEFT JOIN ln la ON la.doc_id = p.doc_a
         |LEFT JOIN ln lb ON lb.doc_id = p.doc_b
         |ORDER BY p.doc_a, p.doc_b""".stripMargin,

    // directional overlap ratio over the same sparse intersection
    // table as q_ngram_jaccard; the Spark prefix×full filter is
    // lossless (pigeonhole — see containmentPairs), so both engines
    // score exactly the pairs sharing >= 1 shingle
    "q_containment" ->
      s"""WITH s AS ($shingleSql),
         |ex AS (SELECT doc_id, unnest(sh) AS t FROM s),
         |sz AS (SELECT doc_id, len(sh) AS n FROM s),
         |ic AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
         |       FROM ex a JOIN ex b ON a.t = b.t AND a.doc_id <> b.doc_id
         |       GROUP BY 1, 2)
         |SELECT id_a, id_b, containment FROM (
         |  SELECT ic.id_a, ic.id_b, CAST(ic.c AS DOUBLE) / sa.n AS containment
         |  FROM ic JOIN sz sa ON sa.doc_id = ic.id_a) p
         |WHERE containment >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    // exact pairwise Jaccard (sparse form, see q_ngram_jaccard) —
    // equals the LSH output because 16x2 banding misses a corpus true
    // pair (all at j >= 0.9) with probability 0.19^16 ≈ 2.9e-12 and
    // the exact verify kills all false positives (see dedupMinhashQ
    // for the full parity argument)
    "q_dedup_minhash" ->
      s"""WITH s AS ($shingleSql),
         |ex AS (SELECT doc_id, unnest(sh) AS t FROM s),
         |sz AS (SELECT doc_id, len(sh) AS n FROM s),
         |ic AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
         |       FROM ex a JOIN ex b ON a.t = b.t AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT ic.id_a, ic.id_b,
         |    CAST(ic.c AS DOUBLE) / (sa.n + sb.n - ic.c) AS jaccard
         |  FROM ic JOIN sz sa ON sa.doc_id = ic.id_a
         |          JOIN sz sb ON sb.doc_id = ic.id_b) p
         |WHERE jaccard >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    // same sparse pair relation as q_dedup_minhash, resolved into
    // components by the recursive-CTE min-reachable-id fixpoint (the
    // q_dedup_groups pattern), then per-component argmax over the
    // fixed-order quality double — ROW_NUMBER (q DESC, doc_id ASC)
    // is identical to the engine's max(struct(q, -doc_id))
    "q_keep_best" ->
      s"""WITH RECURSIVE $componentMapSql,
         |dq AS (
         |  SELECT doc_id,
         |    0.6 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         |           / greatest(length(text), 1))
         |    + 0.4 * (CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+', 0))
         |                    BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) AS q
         |  FROM documents)
         |SELECT comp, doc_id AS keep_id, q AS quality, n_members FROM (
         |  SELECT cm.comp, cm.id AS doc_id, dq.q,
         |    ROW_NUMBER() OVER (PARTITION BY cm.comp ORDER BY dq.q DESC, cm.id) AS rn,
         |    COUNT(*) OVER (PARTITION BY cm.comp) AS n_members
         |  FROM cm JOIN dq ON cm.id = dq.doc_id) t
         |WHERE rn = 1
         |ORDER BY comp""".stripMargin,

    // per-doc distinct "nov|"-prefixed shingle hashes (replayed in
    // HUGEINT — collisions collapse identically), first occurrence =
    // min doc_id per hash, floor-div percentage
    "q_novelty" -> noveltySql(),

    // the pr pair relation joined to sources twice, unordered cell key
    // by LEAST/GREATEST on the source name
    "q_cross_source_dups" ->
      s"""WITH RECURSIVE $componentMapSql,
         |j AS (
         |  SELECT LEAST(da.source, db.source) AS source_a,
         |    GREATEST(da.source, db.source) AS source_b
         |  FROM pr
         |  JOIN documents da ON pr.id_a = da.doc_id
         |  JOIN documents db ON pr.id_b = db.doc_id)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM j GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin,

    // the shared component map WITH its pr edge relation: per-comp
    // node and edge counts, the integer density pair and both flags
    "q_cluster_density" ->
      s"""WITH RECURSIVE $componentMapSql,
         |ec AS (
         |  SELECT cm.comp, CAST(COUNT(*) AS BIGINT) AS n_edges
         |  FROM pr JOIN cm ON pr.id_a = cm.id GROUP BY cm.comp),
         |nc AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_nodes
         |       FROM cm GROUP BY comp)
         |SELECT nc.comp, nc.n_nodes, COALESCE(ec.n_edges, 0) AS n_edges,
         |  CAST(COALESCE(ec.n_edges, 0) * 2 AS BIGINT) AS density_num,
         |  CAST(nc.n_nodes * (nc.n_nodes - 1) AS BIGINT) AS density_den,
         |  COALESCE(ec.n_edges, 0) = nc.n_nodes - 1 AS is_tree,
         |  COALESCE(ec.n_edges, 0) * 2 = nc.n_nodes * (nc.n_nodes - 1) AS is_clique
         |FROM nc LEFT JOIN ec ON nc.comp = ec.comp
         |ORDER BY nc.comp""".stripMargin,

    // the shared component map, per-cluster count/Σchars/min-id-argmin
    // (ROW_NUMBER BY (id) == min(struct(id, chars))), then the size
    // rollup; HUGEINT → BIGINT
    "q_dedup_savings" ->
      s"""WITH RECURSIVE $componentMapSql,
         |mem AS (
         |  SELECT cm.comp, d.doc_id, CAST(d.n_chars AS BIGINT) AS chars
         |  FROM cm JOIN documents d ON cm.id = d.doc_id),
         |cl AS (
         |  SELECT comp, CAST(COUNT(*) AS BIGINT) AS size,
         |    CAST(SUM(chars) AS BIGINT) AS chars_total,
         |    CAST(MIN(CASE WHEN doc_id = comp THEN chars END) AS BIGINT) AS keep_chars
         |  FROM mem GROUP BY comp)
         |SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(size) AS BIGINT) AS n_docs,
         |  CAST(SUM(size - 1) AS BIGINT) AS n_redundant,
         |  CAST(SUM(chars_total) AS BIGINT) AS chars_total,
         |  CAST(SUM(chars_total - keep_chars) AS BIGINT) AS chars_saved
         |FROM cl GROUP BY size
         |ORDER BY size""".stripMargin,

    // the shared component map, fields melted by a 3-arm UNION ALL,
    // NULL votes dropped, and the (cnt DESC, value ASC) ROW_NUMBER
    // argmax — identical to the engine's min(struct(-cnt, value));
    // n_distinct via COUNT OVER the same frame
    "q_golden_record" ->
      s"""WITH RECURSIVE $componentMapSql,
         |mem AS (
         |  SELECT cm.comp, d.lang, d.source,
         |    CAST(d.n_chars // 100 AS VARCHAR) AS len_bucket
         |  FROM cm JOIN documents d ON cm.id = d.doc_id),
         |members AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_members
         |            FROM cm GROUP BY comp),
         |melted AS (
         |  SELECT comp, 'lang' AS field, lang AS value FROM mem
         |  UNION ALL SELECT comp, 'source', source FROM mem
         |  UNION ALL SELECT comp, 'len_bucket', len_bucket FROM mem),
         |counts AS (
         |  SELECT comp, field, value, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM melted WHERE value IS NOT NULL
         |  GROUP BY comp, field, value),
         |ranked AS (
         |  SELECT comp, field, value, cnt,
         |    ROW_NUMBER() OVER (PARTITION BY comp, field ORDER BY cnt DESC, value ASC) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY comp, field) AS BIGINT) AS n_distinct
         |  FROM counts)
         |SELECT r.comp, r.field, r.value, r.cnt AS n_support, r.n_distinct, m.n_members
         |FROM ranked r JOIN members m ON r.comp = m.comp
         |WHERE r.rn = 1
         |ORDER BY r.comp, r.field""".stripMargin,

    // the keep_best component map, completed with singleton comps
    // (doc_id itself), then the split-hash replay over the DISTINCT
    // comp values: pmod(poly_hash64('csplit|' || comp), 100)
    "q_cluster_split" ->
      s"""WITH RECURSIVE $componentMapSql,
         |wc AS (SELECT d.doc_id, COALESCE(cm.comp, d.doc_id) AS comp
         |       FROM documents d LEFT JOIN cm ON d.doc_id = cm.id),
         |cv AS (SELECT DISTINCT comp FROM wc),
         |hs AS (${TrainingOps.polyHashSql("csplit|", "cv", "comp")}),
         |b AS (SELECT wc.doc_id, wc.comp,
         |        CAST((hs.h % 100 + 100) % 100 AS BIGINT) AS bucket
         |      FROM wc JOIN hs ON wc.comp = hs.comp)
         |SELECT doc_id, comp, bucket,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    // SimHash replayed end-to-end in HUGEINT: token byte-polynomial +
    // splitmix64 (the q_rolling_fingerprint recipe: 64x64-bit products
    // split at 2^32 so nothing exceeds int128), ±1 votes per bit over
    // the token MULTISET, sign fold (strictly-positive = bit set, ties
    // -> 0 matching SimHashAgg.eval), then the exact all-pairs
    // hamming <= 3 join — equal to Spark's banded join by pigeonhole
    // (see dedupSimhashQ). The guard CTE hard-errors if the corpus ever
    // stops being pure ASCII, because ascii(substr) reads code points
    // while the Scala kernel reads UTF-8 bytes.
    "q_dedup_simhash" -> {
      val M = "18446744073709551616"
      s"""WITH guard AS (
         |  SELECT CASE WHEN count(*) > 0 THEN error(
         |      'q_dedup_simhash oracle requires a pure-ASCII corpus')
         |    ELSE 0 END AS ok
         |  FROM documents WHERE octet_length(encode(text)) <> length(text)),
         |tok AS (
         |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS t
         |  FROM documents),
         |th AS (
         |  SELECT doc_id,
         |    list_reduce(
         |      list_prepend(CAST(0 AS HUGEINT),
         |        list_transform(range(1, length(t)+1), i -> CAST(ascii(substr(t,i,1)) AS HUGEINT))),
         |      (a, b) -> (a * 1000003 + b) % $M) AS p
         |  FROM tok),
         |mx AS (
         |  SELECT doc_id,
         |    (p + 11400714819323198485) % $M AS z0,
         |    xor(z0, z0 >> 30) AS t1,
         |    ((t1 % 4294967296) * 13787848793156543929
         |      + (((t1 // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) % $M AS z1,
         |    xor(z1, z1 >> 27) AS t2,
         |    ((t2 % 4294967296) * 10724457036175037673
         |      + (((t2 // 4294967296) * 10724457036175037673) % 4294967296) * 4294967296) % $M AS z2,
         |    xor(z2, z2 >> 31) AS z3
         |  FROM th),
         |bits AS (SELECT unnest(range(0, 64)) AS b),
         |votes AS (
         |  SELECT doc_id, b,
         |    SUM(CASE WHEN (z3 >> b) % 2 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM mx CROSS JOIN bits GROUP BY doc_id, b),
         |sig AS (
         |  SELECT doc_id,
         |    SUM(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END) AS su
         |  FROM votes GROUP BY doc_id),
         |s AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN su >= 9223372036854775808 THEN su - $M
         |              ELSE su END AS BIGINT) AS sim
         |  FROM sig)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id CROSS JOIN guard
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3 AND guard.ok = 0
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q_dedup_exact" ->
      """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY 1
        |ORDER BY h""".stripMargin,

    "q_dedup_norm" ->
      """SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY 1
        |ORDER BY h""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  sha256(text) AS sha,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |  CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS height
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |    CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS height
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, width, height,
        |    greatest(width, 1) AS w0, greatest(height, 1) AS h0
        |  FROM m)
        |SELECT doc_id, width, height,
        |  CAST(floor(w0 * least(224.0 / w0, 224.0 / h0)) AS BIGINT) AS out_w,
        |  CAST(floor(h0 * least(224.0 / w0, 224.0 / h0)) AS BIGINT) AS out_h
        |FROM g
        |ORDER BY doc_id""".stripMargin,

    // the 1-frame-per-KB stub metadata, 8 uniform slots, integer
    // floor-div indices (nonneg), DISTINCT for short clips
    "q_frame_schedule" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    greatest(octet_length(encode(text)) // 1024, 1) AS n_frames
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_frames,
        |    CAST((j.j * (n_frames - 1)) // 7 AS BIGINT) AS frame_idx
        |  FROM m, LATERAL (SELECT unnest(range(0, 8)) AS j) j)
        |SELECT DISTINCT doc_id, CAST(n_frames AS BIGINT) AS n_frames, frame_idx
        |FROM s
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
