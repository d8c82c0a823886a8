package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, HeavyHitters, SkewJoin, TextOps, TrainingOps, TrainingPipeline}
import graft.sources.Tables

/** Dedup-family scaling probe (SURVEY.md §6): measures how the three
  * heavy dedup plans grow when the corpus is replicated in place —
  * the "would this survive 100×" argument as a curve instead of a
  * plan-reading.
  *
  * Replication that preserves workload shape: every word of copy c
  * gets a copy-specific suffix. Token counts, positions, per-doc
  * repetition fractions and within-copy jaccards are IDENTICAL to the
  * base corpus (each word maps 1:1 to a distinct word), so quality and
  * repetition gates behave exactly as at k=1 — an earlier interleaved-
  * token variant silently failed the pipeline's top-word gate on every
  * doc — while cross-copy pairs share no shingles at all. A k× corpus
  * thus carries exactly k× the true pairs and ~k× the candidate
  * volume: measured time growing ~linearly in k means the plan scales
  * with input size, super-linear growth means a pairwise blow-up is
  * hiding somewhere.
  *
  * Run: `sbt "Test/runMain graft.ScaleProbe"` (optionally
  * SPARK_GRAFT_SF_DIR to pick the base corpus, default sf0.1).
  */
object ScaleProbe {

  // id stride from the data, not a constant: a base corpus with ids
  // >= a fixed stride would silently collide across copies, merging
  // docs and corrupting the very scaling curve this probe measures.
  def stride(docs: DataFrame): Long =
    docs.agg(max(col("doc_id"))).head().getLong(0) + 1L

  def replicate(docs: DataFrame, k: Int): DataFrame = {
    val s = stride(docs)
    (0 until k).map { c => suffixed(docs, c.toLong * s, "z" + ('a' + c).toChar) }
      .reduce(_ union _).withColumn("n_chars", length(col("text")))
  }

  /** One shifted copy with `tag` appended to every word (letters only:
    * a digit would dent the alpha-ratio quality term). */
  private def suffixed(docs: DataFrame, shift: Long, tag: String): DataFrame =
    docs.select(
      (col("doc_id") + lit(shift)).as("doc_id"),
      regexp_replace(col("text"), "(\\S+)", "$1" + tag).as("text"))

  /** Embeddings replicated by id shift + per-copy cyclic dimension
    * rotation: rotation preserves norms and within-copy cosines
    * EXACTLY while cross-copy cosines decorrelate (random 64-dim
    * cosine exceeds 0.3 with ~1% probability). Rotation stride 11 is
    * coprime to 64: every copy c in 1..63 gets a NON-identity
    * rotation (a stride of 8 would make copy 8 the identity —
    * duplicating copy 0 exactly — and a shift past 64 a negative
    * slice length). Shared by the semantic_dedup and PQ probes. */
  def replicateEmb(spark: org.apache.spark.sql.SparkSession,
                   sfDir: String, k: Int): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val vs = e.agg(max(col("vec_id"))).head().getLong(0) + 1
    (0 until k).map { c =>
      val shift = (11 * c) % 64
      val emb =
        if (shift == 0) col("embedding")
        else concat(slice(col("embedding"), shift + 1, 64 - shift),
          slice(col("embedding"), 1, shift))
      e.select((col("vec_id") + lit(c.toLong * vs)).as("vec_id"),
        emb.as("embedding"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = TestSpark.spark
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

    // min of two reps: a single shared-JVM measurement mixes GC/JIT
    // noise into the curve (a first sweep showed k=1 slower than k=2);
    // the min is the reproducible cost of the plan itself.
    // SPARK_GRAFT_PROBE_OPS="dup_spans,semantic_dedup" restricts the
    // sweep to named probes (full sweep when unset)
    val onlyOps = sys.env.get("SPARK_GRAFT_PROBE_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    def time(label: String, k: Int)(body: => Long): Unit = {
      if (!onlyOps.forall(_.contains(label))) return
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        val t = (System.nanoTime() - t0) / 1e9
        // the dedup operators persist() internal state and rely on GC
        // for cleanup; dropping it NOW keeps earlier runs' blocks from
        // squeezing later runs' memory and skewing the curve
        spark.sharedState.cacheManager.clearCache()
        (n, t)
      }
      val n = runs.head._1
      println(f"PROBE $label%-16s k=$k%-3d rows=$n%-8d ${runs.map(_._2).min}%.2f s")
    }

    // warmup: touch every plan once so codegen/scan setup is not billed to k=1
    locally {
      val w = replicate(base, 1)
      Dedup.minhashNearDups(w, "doc_id", "text", bands = 16).count()
      TextOps.ngramJaccard(w).count()
      // drop the warmup's persisted dedup state: the first timed cell is
      // the same logical plan and would silently ride these blocks,
      // making exactly one cell of the scaling table warm
      spark.sharedState.cacheManager.clearCache()
    }

    // default sweep 1..8; SPARK_GRAFT_PROBE_KS extends it (e.g.
    // "1,2,4,8,16" — k=16 on the sf0.1 base is a ~sf1.6-equivalent
    // corpus, one decade past the bench SF, still inside the sandbox)
    val ks = sys.env.getOrElse("SPARK_GRAFT_PROBE_KS", "1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    // fixed eval index for the asymmetric screen probe (built once —
    // eval sets are static while batches grow; that asymmetry is the
    // thing the probe measures)
    val evalIdxDir = java.nio.file.Files
      .createTempDirectory("graft_probe_evalidx").toString
    locally {
      // built from COPY 0 (replicate suffixes every word, so the raw
      // base would never match any replicated corpus)
      val split = TrainingOps.assignSplit(replicate(base, 1), col("doc_id"))
      graft.operators.Contamination.writeEvalIndex(
        split.filter(col("split") === "test"), "doc_id", "text", evalIdxDir)
      spark.sharedState.cacheManager.clearCache()
    }
    ks.foreach { k =>
      val docs = replicate(base, k)
      time("minhash_16x2", k) {
        Dedup.minhashNearDups(docs, "doc_id", "text", bands = 16).count()
      }
      // the library scale default: 8 bands x 4 rows keeps background
      // (j~0.1) candidate probability at 1-(1-1e-4)^8 ~ 0.08% vs 16x2's
      // 15%, so the quadratic candidate term stays negligible far longer
      time("minhash_8x4", k) {
        Dedup.minhashNearDups(docs, "doc_id", "text", bands = 8).count()
      }
      time("ngram_jaccard", k) {
        TextOps.ngramJaccard(docs).count()
      }
      time("cc_groups", k) {
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", bands = 16)
        Dedup.connectedComponents(pairs, "id_a", "id_b").count()
      }
      // round-5 additions
      time("decontaminate", k) {
        TrainingOps.decontaminate(docs, "doc_id", "text", minShared = 1).count()
      }
      time("cross_neardup", k) {
        // even/odd id halves: corpus and batch both grow with k, and
        // every planted near-dup pair straddles the cut half the time
        Dedup.minhashCrossNearDups(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text").count()
      }
      time("heavy_hitters", k) {
        HeavyHitters.heavyHitters(
          docs.select(explode(graft.functions.TextFunctions.words(col("text"))).as("token")),
          col("token"), k = 100).count()
      }
      // round-6 additions. Replication preserves the workload exactly:
      // per-copy word suffixes mean cross-copy grams never collide, so
      // a k× corpus carries exactly k× the dup spans.
      time("dup_spans", k) {
        graft.operators.SubstringDedup.dupSpans(docs, "doc_id", "text", n = 10).count()
      }
      time("domain_mixture", k) {
        // synthetic 20-way domain split; budget scales with k so the
        // prefix draw stays selective rather than degenerating to
        // keep-nothing
        val d = docs.select((col("doc_id") % 20).as("domain"), col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
        graft.operators.MixtureOps.temperatureMixture(
          d, col("domain"), col("doc_id"), col("n_tokens"),
          totalBudget = 8000L * k).count()
      }
      // round-8 additions: the bucketed prefix/rank engines. Budgets
      // scale with k so the draws stay selective; the curves must stay
      // sub-linear because only boundary buckets ever pay a sort.
      time("token_budget", k) {
        val d = docs.select((col("doc_id") % 20).as("lang"), col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
        graft.operators.CorpusOps.tokenBudgetSample(
          d, col("lang"), col("doc_id"), col("n_tokens"), budget = 5000L * k).count()
      }
      time("pps_sample", k) {
        val d = docs.select((col("doc_id") % 20).as("lang"), col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
        graft.operators.CorpusOps.ppsSystematicSample(
          d, col("lang"), col("doc_id"), col("n_tokens"), k = 8).count()
      }
      time("shuffle_order", k) {
        graft.operators.TrainingOps.globalShuffleOrder(docs, col("doc_id")).count()
      }
      time("interleave", k) {
        graft.operators.TrainingOps.interleaveOrder(
          docs.select((col("doc_id") % 20).as("corpus"), col("doc_id")),
          col("corpus"), col("doc_id"), col("corpus") % 3 + 1).count()
      }
      time("length_strat", k) {
        graft.operators.CorpusOps.lengthStratifiedSample(
          docs.select(col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens")),
          col("doc_id"), col("n_tokens"), strata = 4, totalBudget = 8000L * k).count()
      }
      time("quality_calib", k) {
        graft.operators.Curation.calibrateQuality(
          graft.operators.Curation.score(docs, col("text"))
            .select((col("doc_id") % 20).as("source"), col("doc_id"), col("quality")),
          col("source"), col("quality"), col("doc_id")).count()
      }
      time("semantic_dedup", k) {
        graft.operators.SemDedup.semanticGroups(
          replicateEmb(spark, sfDir, k), "vec_id", "embedding",
          k = 8 * k, threshold = 0.3).count()
      }
      // round-9 additions: the compressed-domain ANN family. The
      // corpus grows k×; the query set is FIXED (the base corpus'
      // every-50th vector — a serving workload). pq_adc is the honest
      // linear compressed scan (every code row pays m lookup-adds per
      // query); ivfpq scales coarse cells with the corpus (8k cells)
      // at fixed nprobe=2, so per-query candidate volume — and the
      // curve — should stay ~flat in k once the O(n·cells) assignment
      // is paid. Encode is inside the timed body on purpose: at a
      // 100 TB ingest the encode pass is the recurring cost.
      time("pq_adc", k) {
        val rep = replicateEmb(spark, sfDir, k)
        val q = Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") % 50 === 0)
        val cb = graft.operators.PqIndex.hashCodebook(
          rep, "vec_id", "embedding", 64, 4, 8)
        val codes = graft.operators.PqIndex.encode(
          rep, "vec_id", "embedding", cb, 64, 4)
        graft.operators.PqIndex.adcTopK(
          codes, q, "vec_id", "embedding", cb, 64, 4, 5).count()
      }
      time("ivfpq", k) {
        val rep = replicateEmb(spark, sfDir, k)
        val q = Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") % 50 === 0)
        graft.operators.PqIndex.ivfPqTopK(
          rep, q, "vec_id", "embedding", 64, 4, 8,
          kClusters = 8 * k, nprobe = 2, k = 5).count()
      }

      // round-10 additions. kmeans: the full-corpus Lloyd trainer —
      // iters+1 linear passes against a k-row broadcast model, so the
      // curve must track corpus size with no quadratic term. pagerank:
      // a pseudo-random k-growing graph (nodes AND edges scale with
      // k); each iteration is one equi-join + one agg on node ids.
      // bpe_learn: per-copy word suffixes grow the VOCAB k× while the
      // corpus grows k× — the trainer's per-iteration cost rides the
      // vocab table, the one corpus-sized cost is the word count.
      // containment: cross-copy shingles never collide, so true pairs
      // and candidates both grow k× — super-linear growth would mean
      // the prefix filter stopped bounding the join.
      time("kmeans_lloyd", k) {
        graft.operators.ClusterOps.lloydCentroids(
          replicateEmb(spark, sfDir, k), "vec_id", "embedding",
          k = 8, iters = 2).size.toLong
      }
      // smallGraphMax = 0 forces the DISTRIBUTED loop: the probe's
      // purpose is the scaling curve of the distributed plan — the
      // replicated graphs here sit under the driver fast-path bound,
      // which would otherwise measure the (trivially linear) replay
      time("pagerank", k) {
        val n = stride(docs)
        val e = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 2617L + 13L, lit(n)).as("dst"),
          (pmod(col("doc_id"), lit(50)) + 1).as("w"))
        graft.operators.GraphOps.pageRank(e, "src", "dst", "w", iters = 3,
          smallGraphMax = 0L).count()
      }
      time("bpe_learn", k) {
        graft.operators.BpeOps.learnMerges(docs, "text", 6).size.toLong
      }
      time("containment", k) {
        TextOps.containmentPairs(docs, 0.8).count()
      }

      // round-11 additions. decon_bloom: both splits grow k× — the
      // bloom path must stay at-or-under the exact path's linear
      // curve. eval_screen is the ASYMMETRIC deployment shape: the
      // eval index is FIXED (base corpus test split, built once
      // outside the loop) while the screened batch grows k×; per-copy
      // word suffixes mean only copy 0 can match, so true pairs stay
      // constant and the curve isolates the map-side scan+hash cost
      // the bloom cannot remove. chi2 rides one corpus aggregation —
      // the later frames are vocab-sized. contam_score: test positions
      // and train set both grow k×, flagged rows stay k-proportional.
      time("decon_bloom", k) {
        graft.operators.Contamination.decontaminateBloom(
          docs, "doc_id", "text", minShared = 1).count()
      }
      time("eval_screen", k) {
        graft.operators.Contamination.screenAgainstIndex(
          spark, docs, "doc_id", "text", evalIdxDir).count()
      }
      time("contam_score", k) {
        graft.operators.Contamination.contaminationScore(
          docs, "doc_id", "text").count()
      }
      time("chi2_tokens", k) {
        graft.operators.MixtureOps.characteristicTokens(
          docs.select((col("doc_id") % 20).as("domain"), col("text")),
          col("domain"), col("text")).count()
      }
      // count + top-100 + scrub over the k× corpus: count and scrub are
      // both single-pass (the boilerplate set broadcasts), so the curve
      // should track input size
      time("line_scrub", k) {
        val segs = graft.operators.Boilerplate.fixedTokenSegments(col("text"), 2)
        val boiler = graft.operators.Boilerplate.topSegments(
          graft.operators.Boilerplate.segmentFrequencies(docs, col("doc_id"), segs), 100)
        graft.operators.Boilerplate.scrubSegments(
          docs, col("doc_id"), segs, boiler, sep = " ").count()
      }
      // model (one bounded-space aggregation) + scoring (broadcast λ
      // join, per-doc sums) over the k× corpus — the bucket table stays
      // 256 rows at every k
      time("dsir_score", k) {
        graft.operators.Dsir.affinityScores(
          docs, col("doc_id"), col("text"), col("doc_id") % 20 === 0).count()
      }
      // vocab grows k× (suffixed words) and the bigram table with it;
      // count tables stay vocab-bounded broadcasts
      time("collocations", k) {
        graft.operators.LmScore.collocations(
          docs, col("doc_id"), col("text")).count()
      }
      // broadcast phrase joins + one shingle window per multi-word
      // length — should track input size
      time("blocklist", k) {
        // phrases carry copy-0's word suffix, so hits stay constant
        // while the scanned corpus grows k×
        graft.operators.Blocklist.flagged(docs, col("doc_id"), col("text"),
          Seq("slowza mergeza", "sparkza")).count()
      }
      // one aggregation over the corpus; the checksum is a projection
      // into the agg — pure input-linear
      time("dataset_hash", k) {
        graft.operators.Profiling.datasetFingerprint(docs,
          Seq(col("doc_id"), col("text")),
          groupCols = Seq(col("doc_id") % 20)).count()
      }
      // k disjoint copies of the near-dup edge list (id-shifted):
      // edges and triangles grow EXACTLY k×, isolating the wedge-closure
      // kernel from edge generation; degree orientation caps wedge
      // volume at O(m^1.5)
      time("triangles", k) {
        val e0 = graft.operators.VectorOps.nearDupPairs(
            Tables.embeddings(spark, sfDir), "vec_id", "embedding", "label",
            threshold = 0.3)
          .select(col("id_a"), col("id_b"))
        val es = e0.agg(max(greatest(col("id_a"), col("id_b")))).head().getLong(0) + 1L
        val edges = (0 until k).map { c =>
          e0.select((col("id_a") + c * es).as("id_a"), (col("id_b") + c * es).as("id_b"))
        }.reduce(_ union _)
        graft.operators.GraphOps.triangleCounts(edges, "id_a", "id_b").count()
      }

      // round-9 (driver round) additions. hll_registers: one pass,
      // constant 2^p-byte buffer per task — the curve must track input
      // size with no cardinality term. label_prop: k disjoint copies of
      // the near-dup edge list (the triangles replication): nodes and
      // edges grow exactly k×, each round is one equi-join + two aggs.
      // version_diff: both snapshots grow k×, the diff joins 16-byte
      // fingerprints on the id. keep_best / cluster_split ride the
      // minhash_16x2 + cc_groups curves (one extra broadcast join +
      // one aggregation each — not separately probed).
      time("hll_registers", k) {
        docs.select((col("doc_id") % 20).as("g"),
            explode(graft.functions.TextFunctions.words(col("text"))).as("item"))
          .groupBy(col("g"))
          .agg(graft.plans.HllRegistersAgg.hll_registers(col("item"), 6).as("r"))
          .count()
      }
      time("label_prop", k) {
        val e0 = graft.operators.VectorOps.nearDupPairs(
            Tables.embeddings(spark, sfDir), "vec_id", "embedding", "label",
            threshold = 0.3)
          .select(col("id_a"), col("id_b"))
        val es = e0.agg(max(greatest(col("id_a"), col("id_b")))).head().getLong(0) + 1L
        val edges = (0 until k).map { c =>
          e0.select((col("id_a") + c * es).as("id_a"), (col("id_b") + c * es).as("id_b"))
        }.reduce(_ union _)
        graft.operators.GraphOps.labelPropagation(edges, "id_a", "id_b", iters = 4,
          smallGraphMax = 0L).count() // distributed loop, as for pagerank
      }
      // per-copy word suffixes keep cross-copy shingles disjoint, so
      // novelty structure per copy is identical to the base — rows and
      // distinct hashes grow exactly k×, isolating the window+agg cost
      time("novelty", k) {
        TextOps.noveltyScores(docs, "doc_id", "text").count()
      }
      time("version_diff", k) {
        val v2 = docs.filter(pmod(col("doc_id"), lit(23)) =!= 0)
          .withColumn("text", when(pmod(col("doc_id"), lit(17)) === 0,
            concat(col("text"), lit(" r2"))).otherwise(col("text")))
        graft.operators.Profiling.versionDiff(docs, v2, "doc_id", "text").count()
      }

      // Novelty ingest vs full recompute: the batch is FIXED (one
      // fresh base-sized copy, all-new hashes) while the committed
      // state grows k×. The ingest pays O(batch) commit + a scan of
      // the compact hash state (no corpus TEXT); the full path
      // re-shingles the whole corpus every time.
      if (onlyOps.forall(s => s.contains("nov_ingest") || s.contains("nov_full"))) {
        import graft.operators.NoveltyState
        val nroot = java.nio.file.Files
          .createTempDirectory(s"graft_probe_nov_k$k").toString
        NoveltyState.commitNoveltyDelta(spark, docs, "doc_id", "text", nroot, "corpus")
        spark.sharedState.cacheManager.clearCache()
        val nbatch = suffixed(base, 999L * stride(base), "zz")
        time("nov_ingest", k) {
          NoveltyState.commitNoveltyDelta(spark, nbatch, "doc_id", "text", nroot, "probe")
          NoveltyState.scoreAgainstState(
            NoveltyState.stateFrom(spark, nroot), nbatch, "doc_id", "text").count()
        }
        time("nov_full", k) {
          TextOps.noveltyScores(
              docs.select(col("doc_id"), col("text")).unionByName(nbatch),
              "doc_id", "text")
            .filter(col("doc_id") >= 999L * stride(base)).count()
        }
      }

      // Incremental ingest vs re-running the full pipeline: the batch is
      // FIXED (one fresh base-sized copy, lang column required by the
      // pipeline) while the corpus grows k×. The full run re-pays the
      // whole corpus every time; the ingest pays O(batch) plus linear
      // scans of the compact state tables — read back from parquet, as
      // in deployment, so the timed cell includes no bootstrap lineage
      // and cache clears between reps cannot leak bootstrap work in.
      if (onlyOps.forall(s => s.contains("incr_ingest") || s.contains("full_pipeline"))) {
        val lang = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
        def withLang(d: DataFrame) = d
          .withColumn("__base", col("doc_id") % lit(stride(base)))
          .join(lang.withColumnRenamed("doc_id", "__base"), Seq("__base"))
          .select(col("doc_id"), col("lang"), col("text"))
        val corpusK = withLang(docs)
        val batch = withLang(suffixed(base, 999L * stride(base), "zz"))
        val stateDir = java.nio.file.Files
          .createTempDirectory(s"graft_probe_state_k$k").toString
        TrainingPipeline.saveState(TrainingPipeline.bootstrapState(corpusK), stateDir)
        spark.sharedState.cacheManager.clearCache()
        time("incr_ingest", k) {
          val delta = TrainingPipeline.runIncremental(
            TrainingPipeline.loadState(spark, stateDir), batch)
          delta.accepted.count() + delta.tombstones.count()
        }
        time("full_pipeline", k) {
          TrainingPipeline.run(corpusK.unionByName(batch)).count()
        }
      }
      // round-11: the HTML front gate (pure projection + one
      // reassembly shuffle — must track corpus size linearly) and the
      // unigram tokenizer (distinct-word-frame work: replicate()'s
      // per-copy word suffixes grow the vocab ~k×, the realistic
      // scaling for a tokenizer trainer)
      time("html_extract", k) {
        val html = concat(lit("<html><head><title>D</title></head><body>" +
          "<nav><a href=\"/\">Home</a> <a href=\"/d\">Docs</a></nav><p>"),
          col("text"), lit("</p><div><a href=\"/t\">Terms</a> <a href=\"/p\">Priv</a></div></body></html>"))
        graft.operators.Markup.htmlToText(
          docs.select(col("doc_id"), html.as("html")), "doc_id", "html").count()
      }
      time("unigram_encode", k) {
        graft.operators.UnigramTok.encode(docs, "doc_id", "text",
          graft.operators.UnigramTok.train(docs, "text", iters = 1)).count()
      }
      // round-11: hot-key salted join under a Zipf key. Half the fact
      // rows land on ONE celebrity key, the rest spread over 1000 —
      // the shape where an unsalted shuffle join single-tasks. Output
      // grows linearly with k (join semantics); the probe verifies the
      // salted plan's RUNTIME tracks that linear output rather than
      // the quadratic stall a one-partition hot key would produce.
      locally {
        val h = pmod(xxhash64(col("doc_id")), lit(2000L))
        val fact = docs.select(
          when(h < 1000L, 0L).otherwise(h - 999L).as("k"),
          col("doc_id").as("v"))
        val dim = spark.range(1001).select(col("id").as("k"), (col("id") * 7).as("w"))
        time("salted_join", k) {
          SkewJoin.salted(fact, dim, "k", minRows = 1000L, salt = 16).count()
        }
      }
      // round-12: the WARC container fold (per-file projection — one
      // archive per 50 docs so file COUNT grows with k, the Common
      // Crawl parallel unit), the suffix-order longest-dup pass (the
      // position frame is corpus-char-sized; bucketed sort + lag must
      // track it linearly), and the KMV overlap (k-bounded sketches:
      // the curve should be the SCAN, flat algebra)
      time("warc_extract", k) {
        val body = concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>"))
        val rec = concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
            "https://x/d/"), col("doc_id").cast("string"),
          lit("\r\nContent-Length: "), length(body).cast("string"),
          lit("\r\n\r\n"), body, lit("\r\n\r\n"))
        val files = docs.select((col("doc_id") % 50L).as("file"), col("doc_id"), rec.as("rec"))
          .groupBy(col("file"))
          .agg(concat_ws("", transform(sort_array(collect_list(
            struct(col("doc_id"), col("rec")))), x => x.getField("rec"))).as("warc"))
        graft.sources.Warc.records(files, "file", "warc").count()
      }
      time("longest_dup", k) {
        graft.operators.SuffixOps.longestDupSpans(docs, "doc_id", "text").count()
      }
      time("kmv_overlap", k) {
        val hashed = docs.select(col("doc_id"),
          graft.plans.PolyHash64.poly_hash64(col("text")).as("h"))
        graft.operators.CorpusOverlap.overlap(
          hashed.filter(col("doc_id") % 2 === 0),
          hashed.filter(col("doc_id") % 3 === 0), "h").count()
      }
      // round-12: the bucketed-prefix engine under a USER frame that
      // grows k× with near-distinct metric values — the exact shape
      // whose single-window form single-tasks; the probe is the
      // evidence behind accepting q_rfm/q_abc's fixed decomposition
      // overhead
      time("rfm_scores", k) {
        val events = docs.select(
          col("doc_id").as("user_id"),
          timestamp_micros(lit(1700000000000000L) +
            pmod(xxhash64(col("doc_id")), lit(10000000L)) * 1000000L).as("ts"),
          (pmod(xxhash64(col("doc_id"), lit(3)), lit(1000000L)).cast("double") / 100.0)
            .as("value"))
        graft.operators.Analytics.rfmScores(
          events, col("user_id"), col("ts"), col("value")).count()
      }
      // round-12 continuation: the web-IR link kernels and the KS
      // drift test. hits: edge count grows k× into a fixed 1000-node
      // authority side (per-iteration shuffles must track edges
      // linearly). ks_test: near-distinct doubles make the
      // distinct-value frame corpus-sized — the bucketed cumulative
      // must track it, never a single-task window. anchor_agg:
      // url-keyed aggs with constant per-url fan-in.
      time("hits", k) {
        val e = docs.select(col("doc_id").as("s"),
          pmod(xxhash64(col("doc_id")), lit(1000L)).as("d"))
        graft.operators.WebIr.hits(e, "s", "d", iters = 2,
          smallGraphMax = 0L).count() // distributed loop, as for pagerank
      }
      time("ks_test", k) {
        val vals = docs.select(
          (pmod(xxhash64(col("doc_id"), lit(5)), lit(1000000000L)).cast("double") / 1000.0)
            .as("value"),
          when(col("doc_id") % 2 === 0, "a").otherwise("b").as("g"))
        graft.operators.Regression.ksTest(
          vals, col("value"), col("g"), "a", "b").count()
      }
      time("anchor_agg", k) {
        val links = docs.select(col("doc_id").as("src"),
          concat(lit("https://h/"), pmod(col("doc_id"), lit(5000L)).cast("string")).as("url"),
          concat(lit("anchor "), pmod(xxhash64(col("doc_id")), lit(3L)).cast("string")).as("anchor"))
        graft.operators.WebIr.anchorAggregate(links, "url", "anchor", "src").count()
      }
      // round-13 additions: the band join's pair volume grows with k²
      // over a FIXED value range if both sides replicate raw — keep the
      // value space growing with k too (mod k·5000) so per-bucket
      // occupancy stays constant and the probe measures the PLAN, k×
      // rows → ~k× time; gini rides the shared bucketed-prefix engine
      time("band_join", k) {
        val l = docs.select(pmod(xxhash64(col("doc_id")), lit(k * 5000L)).as("lv"))
        val r = docs.select(pmod(xxhash64(col("doc_id") + 7L), lit(k * 5000L)).as("rv"))
        graft.operators.BandJoin.bandJoin(l, r, col("lv"), col("rv"), eps = 10).count()
      }
      time("gini", k) {
        graft.operators.Profiling.gini(docs, length(col("text")), col("doc_id"))
          .count()
      }
      time("mwu", k) {
        graft.operators.Regression.mannWhitneyU(
          docs.select(pmod(xxhash64(col("text")), lit(4096L)).as("v"),
            when(col("doc_id") % 2 === 0, "a").otherwise("b").as("g")),
          col("v"), col("g"), "a", "b").count()
      }
      // round-14 additions: the halving DAG over the replicated id
      // space (edges ~ 2 per node, so |E| grows with k; balls/walks
      // are bounded-depth frontier algorithms — time should track |E|)
      time("hyperball", k) {
        val ids = docs.select(col("doc_id"))
        val e = ids.select(col("doc_id").as("src"),
            (col("doc_id") / 2).cast("long").as("dst"))
          .unionAll(ids.select(col("doc_id").as("src"),
            ((col("doc_id") / 2).cast("long") + 1).as("dst")))
        graft.operators.GraphOps.hyperBall(e, "src", "dst", p = 4, maxRadius = 3,
            smallGraphMax = 0L) // distributed loop, as for pagerank
          .count()
      }
      time("walks", k) {
        val ids = docs.select(col("doc_id"))
        val e = ids.select(col("doc_id").as("src"),
            (col("doc_id") / 2).cast("long").as("dst"))
          .unionAll(ids.select(col("doc_id").as("src"),
            ((col("doc_id") / 2).cast("long") + 1).as("dst")))
        graft.operators.GraphOps.deterministicWalks(e, "src", "dst", 2, 4,
          smallGraphMax = 0L).count() // distributed loop, as for pagerank
      }
      // replicate-stable groups (lang-like mod), doc-count-scaled rows
      time("bootstrap", k) {
        graft.operators.Regression.poissonBootstrapCi(
          docs.select(col("doc_id"),
            pmod(col("doc_id"), lit(5L)).cast("string").as("g"),
            (pmod(xxhash64(col("text")), lit(100000L)).cast("double") / 100.0)
              .as("v")),
          col("g"), col("doc_id"), col("v"), b = 40, loRank = 2, hiRank = 39)
          .count()
      }
      time("seq_patterns", k) {
        graft.operators.Analytics.gappedSeqSupport(
          docs.select(pmod(col("doc_id"), lit(k * 2500L)).as("u"),
            col("doc_id").as("ts"), col("doc_id").as("id"),
            pmod(xxhash64(col("doc_id")), lit(5L)).cast("string").as("t")),
          col("u"), col("ts"), col("id"), col("t")).count()
      }
    }
    spark.stop()
  }
}
