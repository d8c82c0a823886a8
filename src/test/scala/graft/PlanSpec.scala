package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Relational2}

/** Explain-plan audit: the physical plans must show the scale
  * properties SURVEY.md §4 promises — pushdown reaching the scan,
  * broadcast on dims, whole-stage codegen on hot paths.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q_read_project pushes filter and projection into the parquet scan") {
    val p = plan(Relational.readProject(spark, TestSpark.sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), p)
    // projection pruning: the read schema must not include untouched cols
    assert(p.contains("ReadSchema"), p)
    assert(!p.split("ReadSchema").last.split("\n").head.contains("l_tax"), p)
  }

  test("q6 pushes all three predicates") {
    val p = plan(Relational.q6ForecastRevenue(spark, TestSpark.sf))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("l_shipdate"), p)
  }

  test("q5 broadcasts the dim tables") {
    val p = plan(Relational.q5NationRevenue(spark, TestSpark.sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q1 aggregates with whole-stage codegen and partial aggregation") {
    val df = Relational.q1PricingSummary(spark, TestSpark.sf)
    df.collect() // AQE only materializes the final (codegen'd) plan on execution
    val p = plan(df)
    // "*(n)" prefixes mark WholeStageCodegen stages in simpleString
    assert(p.contains("*(1)"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("as-of join plans a single sort-shuffle (no nested-loop join)") {
    val p = plan(Relational.asofJoin(spark, TestSpark.sf))
    assert(!p.contains("NestedLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("native as-of join runs inside a whole-stage codegen span") {
    val df = graft.operators.AsOfJoinOp.asofNativeQ(spark, TestSpark.sf)
    df.collect() // AQE finalizes (and codegens) stages only on execution
    val p = plan(df)
    // the exec itself must carry a *(n) stage marker — not just its inputs
    assert(p.linesIterator.exists(l => l.contains("AsOfJoin") && l.contains("*(")), p)
  }

  test("q18 keeps the having filter after partial aggregation, no cartesian") {
    val p = plan(Relational2.q18LargeOrders(spark, TestSpark.sf))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("interval join plans as an equi hash/merge join, never nested-loop") {
    val p = plan(graft.operators.Analytics.intervalJoinQ(spark, TestSpark.sf))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("fuzzy match blocks by band: equi join, no cartesian") {
    val p = plan(graft.operators.Fuzzy.fuzzyMatchQ(spark, TestSpark.sf))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("stratified sample pushes the lang filter side into the scan") {
    val p = plan(graft.operators.Sampling.stratifiedSampleQ(spark, TestSpark.sf))
    // the md5 threshold can't push down, but the plan must stay a single
    // scan + filter (no join/shuffle)
    assert(!p.contains("Exchange") || p.contains("rangepartitioning"), p)
    assert(p.contains("Filter"), p)
  }

  test("upsert is a single shuffle on the merge key (one window, no join)") {
    val p = plan(graft.operators.Cdc.mergeUpsertQ(spark, TestSpark.sf))
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("tfidf broadcasts document frequency (no shuffle of TF rows for the join)") {
    val p = plan(graft.operators.TextOps2.tfidfQ(spark, TestSpark.sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("profile is one aggregate pass (no join, single scan of events)") {
    val p = plan(graft.operators.Profiling.profileQ(spark, TestSpark.sf))
    assert(!p.contains("Join"), p)
    // one FileScan of events only
    assert(p.split("FileScan").length == 2, p)
  }

  test("eventsRange pushes the time bound to the raw nanos scan") {
    val df = graft.sources.Tables.eventsRange(spark, TestSpark.sf,
      1704067200000000L, 1704672000000000L) // 2024-01-01 .. 2024-01-08 UTC
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,") ||
           p.contains("GreaterThanOrEqual(ts,"), p)
    assert(df.count() > 0)
  }

  // ---- round-5 operators -------------------------------------------------

  test("heavy hitters: sketch partials object-agg'd, candidates broadcast into the recount") {
    val df = graft.operators.HeavyHitters.heavyHittersQ(spark, TestSpark.sf)
    df.collect() // AQE finalizes join strategies on execution
    val p = plan(df)
    // the sketch runs as a (partial) ObjectHashAggregate, not a full groupBy of the tail
    assert(p.contains("ObjectHashAggregate"), p)
    // the <= capacity candidate set must reach the recount as a broadcast
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("cross dedup: distinct corpus hashes broadcast to the batch side, text never joined") {
    val df = graft.operators.CorpusOps.crossDedupQ(spark, TestSpark.sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    // only the 128-bit content hash crosses the shuffle and the broadcast:
    // the corpus side exchanges on __h alone (text stays below, feeding md5)
    assert(p.contains("Exchange hashpartitioning(__h"), p)
    assert(p.contains("HashedRelationBroadcastMode(List(input[0, string"), p)
  }

  test("split assignment is a pure projection: no join, no aggregate") {
    val p = plan(graft.operators.TrainingOps.splitAssignQ(spark, TestSpark.sf))
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("packing runs one window exchange per group key, no join") {
    val p = plan(graft.operators.TrainingOps.packSequencesQ(spark, TestSpark.sf))
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("dup spans: equi-joined gram occurrences, never a cartesian") {
    val p = plan(graft.operators.SubstringDedup.dupSpansQ(spark, TestSpark.sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    // the gram-count aggregation combines map-side before the shuffle
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("semantic dedup: k-row seed broadcast, pair join blocked on cluster") {
    // checkpoint = false: the production query localCheckpoints its
    // result (cache hygiene), which truncates the plan to a Scan
    // ExistingRDD — the pin needs the lineage intact
    val p = plan(graft.operators.SemDedup.semanticGroups(
      graft.sources.Tables.embeddings(spark, TestSpark.sf),
      "vec_id", "embedding", k = 8, threshold = 0.3, checkpoint = false))
    // the seed scoring pass broadcasts the k-row side
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // the pair stage is an equi join on cluster (+ id range residual),
    // never an unblocked cartesian over the vectors
    assert(!p.contains("CartesianProduct"), p)
  }

  test("domain mixture: broadcast budgets, no per-domain unbounded window over docs") {
    val p = plan(graft.operators.MixtureOps.domainMixtureQ(spark, TestSpark.sf))
    assert(p.contains("BroadcastExchange"), p)
    // the draw runs on the bucketed prefix engine: every window
    // partitions on an engine-internal key (the bounded cut frame's
    // __cg, or the boundary residual's (__g, __b)) — no window ever
    // partitions on the raw domain alone over the doc frame, and none
    // is unpartitioned, so no domain funnels to one task
    val offEngine = "windowspecdefinition\\((?!__)".r
    assert(offEngine.findFirstIn(p).isEmpty, p)
    // the boundary residual is sub-bucketed: its window keys include
    // the bucket id alongside the group
    assert("windowspecdefinition\\(__g#\\d+[^,]*, __b#".r.findFirstIn(p).nonEmpty, p)
  }

  test("shuffle order: the only unpartitioned window runs over the bounded cut frame") {
    val p = plan(graft.operators.TrainingOps.shuffleOrderQ(spark, TestSpark.sf))
    // the per-doc rank window is partitioned by the hash bucket (the
    // constant group key folds away under the optimizer)
    assert("windowspecdefinition\\(__b#\\d+[^,]*, __h#".r.findFirstIn(p).nonEmpty, p)
    // every window key is engine-internal — no window orders the raw
    // doc frame globally
    assert("windowspecdefinition\\((?!__)".r.findFirstIn(p).isEmpty, p)
  }

  test("length-stratified: doc-frame windows partition by (length, hash bucket)") {
    val p = plan(graft.operators.CorpusOps.lengthStratifiedQ(spark, TestSpark.sf))
    // every window key is engine-internal or the bounded length key —
    // nothing orders the raw doc frame globally or by length alone
    assert("windowspecdefinition\\((?!__|n_tokens#)".r.findFirstIn(p).isEmpty, p)
    // the within-cell rank partitions by BOTH length and hash bucket,
    // so one popular length class cannot funnel to a single task
    assert("windowspecdefinition\\(n_tokens#\\d+L?, __b#".r.findFirstIn(p).nonEmpty, p)
  }

  test("PPS sample: bucketed engine, no per-group unbounded window over docs") {
    val p = plan(graft.operators.CorpusOps.ppsSampleQ(spark, TestSpark.sf))
    val offEngine = "windowspecdefinition\\((?!__)".r
    assert(offEngine.findFirstIn(p).isEmpty, p)
    assert("windowspecdefinition\\(__g#\\d+[^,]*, __b#".r.findFirstIn(p).nonEmpty, p)
  }

  test("PQ ADC: broadcast codebook/LUT joins, k-bounded top-k, no per-query candidate window") {
    val p = plan(graft.operators.PqIndex.pqTopKQ(spark, TestSpark.sf))
    // codebook + LUT reach the scan side as broadcasts
    assert(p.contains("BroadcastExchange"), p)
    // top-k per query is the MinKByLong object aggregate (map-side
    // k-bounded buffers), never a window sorting scored candidates
    assert(p.toLowerCase.contains("minkbylong"), p)
    assert(!"windowspecdefinition\\(qid#".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("IVF-PQ: cell-blocked equi joins only, shortlist/probe frames broadcast") {
    val p = plan(graft.operators.PqIndex.ivfPqTopKQ(spark, TestSpark.sf))
    assert(p.contains("BroadcastExchange"), p)
    assert(p.toLowerCase.contains("minkbylong"), p)
    // the candidate restriction is an equi join on cluster, the ADC
    // join an equi join on (qid, sub, code) — never a cartesian over
    // (query × corpus)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("BM25: query terms and stats broadcast, top-k aggregated — no corpus window") {
    val p = plan(graft.operators.TextOps2.bm25Q(spark, TestSpark.sf))
    assert(p.contains("BroadcastExchange"), p)
    assert(p.toLowerCase.contains("minkbylong"), p)
    // ranking stays fully aggregator-side — no rank window anywhere;
    // the only windows are the KEYED single-exchange replacements of
    // groupBy+join-back pairs (dl per doc_id over tf, df per token
    // over the query-restricted postings) — never an unkeyed window
    assert(!p.contains("row_number"), p)
    assert("windowspecdefinition\\((?!doc_id#|token#)".r.findFirstIn(p).isEmpty, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("token ids: vocab rank window bounded by the limit, mapping broadcast") {
    val p = plan(graft.operators.TrainingOps.tokenIdsQ(spark, TestSpark.sf))
    assert(p.contains("BroadcastExchange"), p)
    // exactly one window — the vocab rank — and it sits above a
    // LIMIT-bounded frame (TakeOrderedAndProject under AQE), never the
    // exploded token stream
    assert("windowspecdefinition".r.findAllIn(p).size == 1, p)
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit")
      || p.contains("Limit"), p)
  }

  test("top bigrams: leads by array indexing — the only window is the lang-keyed rank, group-limit bounded") {
    val p = plan(graft.operators.LmScore.topBigramsQ(spark, TestSpark.sf))
    // the old per-doc lead() window (and its token-stream exchange +
    // sort) is gone — the next word is read by array indexing at
    // explode time; the only window left is the per-lang top-10 rank,
    // bounded by WindowGroupLimit before its exchange
    assert("windowspecdefinition\\((?!lang#)".r.findFirstIn(p).isEmpty, p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bigram logprob: leads by array indexing — no window at all, 1-row stats broadcast") {
    val p = plan(graft.operators.LmScore.bigramLogProbQ(spark, TestSpark.sf))
    // the old doc-keyed transition window is gone (array indexing at
    // explode time); nothing else windows either
    assert(!p.contains("windowspecdefinition"), p)
    // the corpus-total join is a broadcast of a 1-row aggregate
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("containment: df window keys on the shingle hash; candidate join is an equi join") {
    val p = plan(graft.operators.TextOps.containmentQ(spark, TestSpark.sf))
    // the only doc-frame windows are (doc-bounded) shingling and the
    // df count keyed on the high-cardinality hash — no doc-id-free
    // text window, no cartesian candidate generation
    assert("windowspecdefinition\\(h#".r.findFirstIn(p).nonEmpty, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("phrase search: the term table broadcasts; no window, no cartesian") {
    val p = plan(graft.operators.PhraseSearch.phraseQ(spark, TestSpark.sf))
    // non-query tokens must drop map-side at a broadcast join — a
    // shuffled join would move every posting of the corpus
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("percolation: must/must-not tables broadcast; veto is an anti join") {
    val p = plan(graft.operators.Percolate.percolateQ(spark, TestSpark.sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("association rules: frequent-token frames broadcast; pair join keys on doc_id") {
    val p = plan(graft.operators.AssocRules.assocQ(spark, TestSpark.sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("calibration: one 1-row broadcast, bucket aggregation is partial") {
    val df = graft.operators.Classify.calibrationQ(spark, TestSpark.sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("vocab growth: checkpoint frame broadcasts on the range predicate") {
    val p = plan(graft.operators.CorpusOps.vocabGrowthQ(spark, TestSpark.sf))
    // the <= cutoff join must be a broadcast nested loop over the
    // k-row checkpoint frame, never a sort-merge over the corpus
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("truecase: the only window is the boundaryless token argmax-free reassembly path") {
    val p = plan(graft.operators.Hygiene.truecaseQ(spark, TestSpark.sf))
    // canonical pick is an aggregation argmax — NO window anywhere in
    // the truecase plan (a per-token window would shuffle the stream
    // once more and single-task celebrity tokens)
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("template prefix: one aggregation, no join, no window over the corpus") {
    val p = plan(graft.operators.Hygiene.templatePrefixQ(spark, TestSpark.sf))
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_min") || p.contains("partial_max"), p)
  }

  test("token drift: single count pass pivoted in-aggregation, 1-row broadcast totals") {
    val p = plan(graft.operators.Profiling.tokenDriftQ(spark, TestSpark.sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("windowspecdefinition"), p)
    // one corpus aggregation keyed on token: the pivot must not add a
    // second token-keyed exchange
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("kappa: contingency is the only corpus aggregation; marginal join full-outer on the tiny frame") {
    val p = plan(graft.operators.Agreement.kappaQ(spark, TestSpark.sf))
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  // ---- rows 194-224 (round-10 second continuation) ----

  test("lf report: one pass — no join, no window, a single wide aggregate") {
    val p = plan(graft.operators.Weak.lfReportQ(spark, TestSpark.sf))
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("Join"), p)
  }

  test("balance audit: melt + two aggregations, no join, no window") {
    val p = plan(graft.operators.Profiling.balanceQ(spark, TestSpark.sf))
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("Join"), p)
  }

  test("auc: distinct-score collapse happens before the rank window") {
    val p = plan(graft.operators.Classify.aucQ(spark, TestSpark.sf))
    // the one global window rides the collapsed frame — a partial_sum
    // (map-side combine of the score groupBy) must appear below it
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("golden record: winners via min(struct) aggregation, never a rank window") {
    val p = plan(graft.operators.TextOps.goldenQ(spark, TestSpark.sf))
    assert(!p.contains("row_number"), p)
  }

  test("join fanout: only the count frames join; the rank window rides them") {
    val p = plan(graft.operators.Profiling.joinFanoutQ(spark, TestSpark.sf))
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("transitions: the from-state frame broadcasts back") {
    val p = plan(graft.operators.Analytics.transitionsQ(spark, TestSpark.sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("oov audit: the vocab broadcasts; tokens never sort-merge join") {
    val p = plan(graft.operators.CorpusOps.oovQ(spark, TestSpark.sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("substring search: query trigrams prune map-side before the distinct") {
    val p = plan(graft.operators.PhraseSearch.substringQ(spark, TestSpark.sf))
    // the isin literal filter must sit below the first exchange
    assert(p.contains("tri") && p.contains("INSET") || p.contains("IN ("), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("label noise: the audited side broadcasts into the pair join") {
    val p = plan(graft.operators.VectorQueries.labelNoiseQ(spark, TestSpark.sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("quantile norm: the pooled cumulative frame broadcasts into the non-equi pick") {
    val p = plan(graft.operators.Curation.quantileNormQ(spark, TestSpark.sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("benford + char runs + readability: pure projections/aggregations, no window") {
    Seq(graft.operators.Dq.benfordQ(spark, TestSpark.sf),
      graft.operators.Hygiene.charRunsQ(spark, TestSpark.sf),
      graft.operators.TextOps2.readabilityQ(spark, TestSpark.sf))
      .foreach { df =>
        val p = plan(df)
        assert(!p.contains("windowspecdefinition"), p)
      }
  }

  test("embed drift: one posexplode pass, no join, no window") {
    val p = plan(graft.operators.VectorQueries.snapshotDriftQ(spark, TestSpark.sf))
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("Join"), p)
  }

  test("url canonicalization is a zero-shuffle per-row projection") {
    val p = plan(graft.operators.Urls.urlCanonQ(spark, TestSpark.sf))
    // only the orderBy sink exchanges; no join, window or aggregate —
    // the suffix table rides the plan as a literal
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("html extraction shuffles once: the per-doc reassembly only") {
    val p = plan(graft.operators.Markup.htmlExtractQ(spark, TestSpark.sf))
    assert(!p.contains("windowspecdefinition"), p)
    // the doc spine join is broadcast/AQE-shaped, never cartesian
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("dup-span cascade: the fused gram pass is cached, not re-sorted per consumer") {
    // a UNIQUE literal input: the shared corpus plan may already sit in
    // the session cache from another suite (CacheManager matches by
    // logical plan), which would swap our fresh InMemoryRelation for a
    // stale one with a different printed shape
    import spark.implicits._
    val docs = Seq(
      (1L, "plan pin alpha beta gamma delta " * 8),
      (2L, "plan pin alpha beta gamma delta " * 8)).toDF("doc_id", "text")
    val p = plan(graft.operators.SubstringDedup.dupSpansCascade(
      docs, "doc_id", "text"))
    // both consumers (count pass, occurrence join) read the cache;
    // the gram lead-window sort lives INSIDE the cached relation
    // (printed once per scan), so outside the cache only the
    // interval-merge sort remains
    val scans = "InMemoryTableScan".r.findAllIn(p).size
    val cachedPlans = "InMemoryRelation".r.findAllIn(p).size
    val sorts = "Sort \\[__id".r.findAllIn(p).size
    assert(scans == 2, s"expected both consumers on the cache, got $scans scans")
    assert(sorts - cachedPlans <= 1,
      s"extra uncached per-doc sort: $sorts sorts vs $cachedPlans cached plans")
  }

  test("WARC record parse is a pure projection: no exchange, no window") {
    import spark.implicits._
    val p = plan(graft.sources.Warc.records(
      Seq(("f", "WARC/1.0\r\nContent-Length: 1\r\n\r\nx\r\n\r\n"))
        .toDF("file", "warc"), "file", "warc"))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("longest-dup: the suffix window partitions by the prefix bucket, top-k is TakeOrdered") {
    import spark.implicits._
    val docs = Seq((1L, "suffix pin body " * 4)).toDF("doc_id", "text")
    val p = plan(graft.operators.SuffixOps.longestDupSpans(docs, "doc_id", "text"))
    // no window orders the position frame globally — every window key
    // leads with the engine-internal __b bucket
    assert("windowspecdefinition\\((?!__b)".r.findFirstIn(p).isEmpty, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("anchor aggregation: every window partitions by the url key, no cartesian") {
    import spark.implicits._
    val links = Seq((1L, "u1", "a"), (2L, "u1", "b"), (1L, "u2", "a"))
      .toDF("src", "url", "anchor")
    val p = plan(graft.operators.WebIr.anchorAggregate(links, "url", "anchor", "src"))
    assert("windowspecdefinition\\((?!url)".r.findFirstIn(p).isEmpty, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("cdx index: per-row carving, no window, no cartesian") {
    val p = plan(graft.operators.WarcOps.cdxIndexQ(spark, TestSpark.sf))
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("redirect resolution: hash equi-joins only — no cartesian, no window") {
    import spark.implicits._
    val r = Seq(("a", "b"), ("b", "c")).toDF("f", "t")
    val p = plan(graft.operators.WebIr.resolveRedirects(r, "f", "t", maxHops = 4))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("ttr gate is a zero-shuffle per-row projection") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val p = plan(graft.operators.TextOps2.ttrGate(
      Seq((1L, "a b c")).toDF("doc_id", "text"), col("doc_id"), col("text"), 450000L))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("KMV overlap: k-bounded partial aggregation, no distinct exchange on values") {
    import spark.implicits._
    val a = (1L to 500L).toDF("h")
    val b = (200L to 700L).toDF("h")
    val df = graft.operators.CorpusOverlap.overlap(a, b, "h", 64)
    df.collect()
    val p = plan(df)
    // the KmvLong aggregator dedups inside its buffer: the plan has
    // partial ObjectHashAggregate stages, never HashAggregate(keys=[h])
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("HashAggregate(keys=[h"), p)
  }

  test("band join plans as an EQUI join on the bucket key, never nested-loop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val l = (1L to 2000L).map(i => i * 7 % 997).toDF("lv")
    val r = (1L to 800L).map(i => i * 13 % 991).toDF("rv")
    val df = graft.operators.BandJoin.bandJoin(l, r, col("lv"), col("rv"), eps = 10)
    df.collect()
    val p = plan(df)
    // the whole point of the bucket blocking: the declarative form of
    // |l-r| <= eps alone would plan BroadcastNestedLoopJoin (cartesian)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("hilbert index is a zero-shuffle per-row fold; ewma windows per key only") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val h = Seq((1L, 3L, 5L)).toDF("id", "x", "y")
      .withColumn("h", graft.operators.ZOrder.hilbertIndex(col("x"), col("y")))
    assert(!plan(h).contains("Exchange"), plan(h))
    val e = graft.operators.Analytics.ewmaDyadic(
      Seq((1L, 1L, 10L)).toDF("k", "t", "v"), col("k"), Seq(col("t")), col("v"), 8)
    val pe = plan(e)
    // one hash-partitioned window on the key — never a global
    // (empty-partition-spec) window
    assert(pe.contains("windowspecdefinition(k"), pe)
    // a global window's spec would LEAD with the order column
    assert(!pe.contains("windowspecdefinition(t#"), pe)
  }

  test("revalidation plan and markdown linearization are zero-shuffle projections") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val f = Seq(("u", 10L, "max-age=60", "\"e\"", 5L)).toDF("u", "fa", "cc", "et", "lm")
    val pr = plan(graft.operators.HttpCache.revalidatePlan(
      f, col("u"), col("fa"), 100L, col("cc"), col("et"), col("lm")))
    assert(!pr.contains("Exchange") && !pr.contains("windowspecdefinition"), pr)
    val md = Seq((1L, "# t\n[a](b)")).toDF("id", "md")
    val pm = plan(graft.operators.Markdown.linearize(md, col("id"), col("md")))
    assert(!pm.contains("Exchange") && !pm.contains("windowspecdefinition"), pm)
  }

  /** The 100x broadcast rule (round-13 verdict): a `broadcast()` HINT is
    * an unconditional order — AQE cannot undo it — so it is only safe on
    * frames whose cardinality does not grow with scale factor. Fixed dims
    * (nation = 25 rows, region = 5) qualify; customer/supplier/part/
    * orders/lineitem grow, and a forced build side over them ORs past the
    * executor heap at 100x where unhinted + AQE would simply shuffle
    * (and still broadcasts at small SF — observe any sf0.1 plan). This
    * pin walks every relational query's ANALYZED plan (hints survive
    * analysis; the optimizer folds them into joins) and rejects any
    * broadcast hint whose subtree is a bare scan of a growing table.
    * Hinted AGGREGATE frames are allowed: each hinted aggregate in the
    * suite is bounded by construction (a global max, a 5-bucket mean). */
  test("relational suite never force-broadcasts a scale-growing bare scan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, ResolvedHint}
    val fixedDims = Set("nation", "region")
    val qs: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] =
      Map("q3_top_orders" -> (Relational.q3TopOrders _),
          "q5_nation_revenue" -> (Relational.q5NationRevenue _)) ++
      Relational2.queries ++ graft.operators.Relational3.queries
    for ((name, fn) <- qs) {
      val analyzed = fn(spark, TestSpark.sf).queryExecution.analyzed
      analyzed.foreach {
        case h: ResolvedHint if h.hints.strategy.isDefined =>
          val bounded = h.child.find(_.isInstanceOf[Aggregate]).isDefined
          val leafTables = h.child.collectLeaves()
            .map(_.simpleString(500))
            .flatMap(l => "([a-z_]+)\\.parquet".r.findAllMatchIn(l)
              .map(_.group(1)))
            .toSet
          assert(bounded || leafTables.subsetOf(fixedDims),
            s"$name force-broadcasts a bare scan of $leafTables - at 100x " +
            "this hint kills the job; drop it and let AQE decide")
        case _ => ()
      }
    }
  }

  test("round-14 operators: user-bounded windows, equi joins only, partial aggregation") {
    import graft.operators.{Analytics, GraphOps, Regression}
    import org.apache.spark.sql.functions.col
    // gapped patterns: the only window partitions by user, never global
    val sp = plan(Analytics.seqPatternsQ(spark, TestSpark.sf))
    assert(sp.contains("windowspecdefinition(u") ||
      sp.contains("windowspecdefinition(user_id"), sp)
    assert(!sp.contains("CartesianProduct") && !sp.contains("NestedLoop"), sp)
    // bootstrap: the xB fan-out is map-side (explode under the agg),
    // replicate sums partial-aggregate before the shuffle
    val bs = plan(Regression.bootstrapQ(spark, TestSpark.sf))
    assert(bs.contains("partial_sum") || bs.contains("partial"), bs)
    assert(!bs.contains("CartesianProduct") && !bs.contains("NestedLoop"), bs)
    // hyperball / walks: frontier equi-joins only
    val hb = plan(GraphOps.hyperBallQ(spark, TestSpark.sf))
    assert(!hb.contains("CartesianProduct") && !hb.contains("NestedLoop"), hb)
    val wk = plan(GraphOps.walksQ(spark, TestSpark.sf))
    assert(!wk.contains("CartesianProduct") && !wk.contains("NestedLoop"), wk)
  }
}
