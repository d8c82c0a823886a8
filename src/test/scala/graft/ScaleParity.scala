package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-parity probe (SURVEY.md §6): oracle CORRECTNESS — not just
  * timing — at sf1-equivalent volume. Replicates the sf0.1 corpus
  * k=10× with the ScaleProbe protocol (word-suffixed documents,
  * rotation-replicated embeddings, key-shifted relational copies),
  * materializes the replica as a testdata-shaped dir of single parquet
  * files, and dumps the round-10–12 family queries against it in the
  * exact Verify shape, so `tools/compare_oracle.py <dir> <out>` then
  * replays the same oracles in DuckDB over the same replica and
  * compares hash-exactly.
  *
  * Run:
  *   sbt "Test/runMain graft.ScaleParity /tmp/scale10 /tmp/scale10_out"
  *   python3 tools/compare_oracle.py /tmp/scale10 /tmp/scale10_out
  */
object ScaleParity {

  /** The families whose parity previously existed only at sf0.01.
    * Round-9 continuation added the document/embedding families;
    * round-14 replicates `events` too, so the events-keyed families
    * (q_mwu, q_ewma, sessions, RFM, ...) replay at k=10 as well. */
  val Families: Set[String] = Set(
    "q_kmeans", "q_pagerank",
    "q_bpe_pairs", "q_bpe_merges", "q_bpe_encode",
    "q_cms_tokens", "q_dsir_select",
    "q_frequent_lines", "q_line_scrub",
    "q_collocations", "q_triangles",
    "q_label_prop", "q_keep_best", "q_cluster_split",
    "q_novelty", "q_version_diff",
    // round-10 families
    "q_seed_distance", "q_apportion", "q_span_corrupt",
    "q_normal_eq", "q_embed_moments", "q_retrieval_eval",
    // round-12 continuation families
    "q_hits", "q_ppr", "q_anchor_text", "q_cocitation", "q_cdx_diff",
    "q_ttr", "q_ngram_f1", "q_text_tiling", "q_domain_report",
    // round-13: the WARC family — seed archives are assembled FROM
    // documents in both engines, so they scale with the replica (per-
    // host archive strings grow 10x; offsets, carving and the DSv2
    // file/connector paths all re-verify at sf1-equivalent volume)
    "q_warc_extract", "q_wet_text", "q_cdx_index", "q_warc_source",
    "q_cdx_source",
    // round-13 second wave: every doc-keyed new family plus the
    // lineitem/orders-keyed TPC-H completions (dims copy verbatim;
    // both engines read the same replica files, so parity holds)
    "q_md_linearize", "q_hilbert", "q_gini", "q_pass_at_k", "q_revalidate",
    "q_bib_coupling", "q_host_graph", "q_group_kfold", "q_robots_meta",
    "q_band_join", "q7_nation_volume", "q8_market_share", "q10_returned",
    "q13_cust_dist", "q15_top_supplier", "q17_small_qty",
    "q21_late_suppliers", "q22_global_sales",
    "q_wordpiece",
    // round-14: the events-keyed families, unlocked by the events
    // replica (user/event ids shifted per copy, timestamps and values
    // verbatim — every copy is a cloned user population, so per-user
    // densities, session shapes and windows are exactly preserved
    // while user-keyed shuffles and windows process 10x the rows)
    "q_mwu", "q_ewma", "q_funnel", "q_retention", "q_rfm", "q_diurnal",
    "q_ohlc", "q_lateness", "q_ks_test", "q_event_paths", "q_transitions",
    "q_attribution", "q_interval_cover", "q_sessionize", "q_hll_registers",
    // round-14 new operators (doc-keyed halving DAG; events-keyed CIs)
    "q_hyperball", "q_bootstrap", "q_seq_patterns", "q_walks", "q_rbo",
    // round-15: the newly oracle-gated ex-rows-only queries — register
    // images (events/lineitem-keyed), the histogram quantile ladder,
    // the integer-plane LSH replay (embeddings-keyed; the 10 query
    // vectors stay original, candidates grow 10x), and the LM count
    // images (doc-keyed)
    "q_hll_users", "q_approx_distinct", "q_approx_quantiles",
    "q_knn_lsh", "q_unigram_logprob", "q_bigram_logprob")

  /** Write `df` as a SINGLE parquet file `<dir>/<table>.parquet` —
    * the driver-testdata shape both engines read. */
  private def writeSingle(df: DataFrame, dir: String, table: String): Unit = {
    val tmp = s"$dir/__tmp_$table"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written for $table"))
    Files.move(part.toPath, Paths.get(s"$dir/$table.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  /** Documents ×k: ScaleProbe's workload-shape-preserving replication
    * (every word of copy c suffixed, ids shifted), full schema kept. */
  private def replicateDocs(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    (0 until k).map { c =>
      val tag = "z" + ('a' + c).toChar
      docs.select(
        (col("doc_id") + lit(c.toLong * s)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1" + tag).as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionByName _)
      .withColumn("n_chars", length(col("text")))
  }

  /** Embeddings ×k: id shift + per-copy cyclic rotation (stride 11,
    * coprime to 64 — see ScaleProbe.replicateEmb), label kept. */
  private def replicateEmb(e: DataFrame, k: Int): DataFrame = {
    val vs = e.agg(max(col("vec_id"))).head().getLong(0) + 1
    (0 until k).map { c =>
      val shift = (11 * c) % 64
      val emb =
        if (shift == 0) col("embedding")
        else concat(slice(col("embedding"), shift + 1, 64 - shift),
          slice(col("embedding"), 1, shift))
      e.select((col("vec_id") + lit(c.toLong * vs)).as("vec_id"),
        emb.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
  }

  /** One relational table ×k with the named key columns shifted by a
    * per-copy stride each — every copy is a disjoint key space, so the
    * pagerank join derivation processes k× the rows. */
  private def replicateKeyed(df: DataFrame, k: Int,
                             strides: Map[String, Long]): DataFrame =
    (0 until k).map { c =>
      df.select(df.columns.map { cn =>
        strides.get(cn) match {
          case Some(st) => (col(cn) + lit(c * st)).as(cn)
          case None => col(cn)
        }
      }: _*)
    }.reduce(_ unionByName _)

  /** Events ×k: user_id and event_id shifted per copy (disjoint key
    * spaces), ts/event_type/value/props VERBATIM — each copy is a
    * cloned user population, so per-user event densities, session
    * gaps, and window extents are preserved exactly while every
    * user-keyed shuffle and window processes k× the rows. `ts` is
    * normalized through Tables.events (both engines read the replica
    * with the same truncation), written back as µs timestamps. */
  private def replicateEvents(e: DataFrame, k: Int): DataFrame = {
    val se = e.agg(max(col("event_id"))).head().getLong(0) + 1L
    val su = e.agg(max(col("user_id"))).head().getLong(0) + 1L
    (0 until k).map { c =>
      e.select((col("event_id") + lit(c * se)).as("event_id"), col("ts"),
        (col("user_id") + lit(c * su)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
  }

  def buildReplica(spark: SparkSession, sfDir: String, dir: String, k: Int): Unit = {
    new java.io.File(dir).mkdirs()
    // untouched tables: copied verbatim so the compare tool's view
    // creation (and any cross-table oracle) sees a complete dataset
    Seq("region", "nation", "part").foreach { t =>
      Files.copy(Paths.get(s"$sfDir/$t.parquet"), Paths.get(s"$dir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    writeSingle(replicateEvents(Tables.events(spark, sfDir), k), dir, "events")
    writeSingle(replicateDocs(
      Tables.documents(spark, sfDir), k), dir, "documents")
    writeSingle(replicateEmb(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"),
        col("label")), k), dir, "embeddings")
    // key strides from the base data — large enough that copies never
    // collide (same rationale as ScaleProbe.stride)
    def strideOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L
    val ord = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val (so, sc, ss) = (strideOf(ord, "o_orderkey"),
      strideOf(cust, "c_custkey"), strideOf(supp, "s_suppkey"))
    writeSingle(replicateKeyed(ord, k,
      Map("o_orderkey" -> so, "o_custkey" -> sc)), dir, "orders")
    writeSingle(replicateKeyed(li, k,
      Map("l_orderkey" -> so, "l_suppkey" -> ss)), dir, "lineitem")
    writeSingle(replicateKeyed(cust, k,
      Map("c_custkey" -> sc)), dir, "customer")
    writeSingle(replicateKeyed(supp, k,
      Map("s_suppkey" -> ss)), dir, "supplier")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale10")
    val out = args.lift(1).getOrElse("/tmp/scale10_out")
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "10").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = TestSpark.spark
    println(s"[scale-parity] building k=$k replica of $sfDir at $dir")
    buildReplica(spark, sfDir, dir, k)
    println(s"[scale-parity] dumping ${Families.size} family queries to $out")
    Verify.dump(spark, dir, out, Some(Families))
    println("[scale-parity] done — now run: " +
      s"python3 tools/compare_oracle.py $dir $out")
  }
}
