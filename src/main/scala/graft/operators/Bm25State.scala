package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Incremental retrieval-index state (SURVEY.md §2 row 169) — BM25
  * postings that GROW by document batches without re-tokenizing the
  * corpus: the [[GraphState]] delta posture applied to the row-111
  * persisted index.
  *
  * Why batches compose exactly: a document lives in exactly ONE batch,
  * so its postings rows (doc_id, token, tf, dl) are computed entirely
  * within that batch and are DISJOINT from every other batch's — the
  * accumulated postings table is the plain union of batch partitions,
  * no merge arithmetic at all; and the index stats (n_docs, tot_dl)
  * are additive counters, one tiny row per batch, re-summed at read
  * time. Ingesting a batch therefore costs O(batch) tokenization and
  * an O(batch) commit; existing state is never read OR rewritten on
  * the write path, and a retried batchId overwrites its own partition
  * (idempotent). Scoring reads the partitioned postings dir exactly
  * like the direct index — [[TextOps2.bm25FromPostings]] unchanged —
  * so query cost is independent of how many batches built the index.
  *
  * df/idf freshness falls out for free: df is derived at QUERY time
  * from the query-restricted accumulated postings (the row-111
  * design), so there is no materialized df table to go stale as
  * batches land.
  */
object Bm25State {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Tokenize ONE batch of docs and land its postings + stats as the
    * batch's own partitions. Re-running a batchId overwrites its
    * partitions only. */
  def commitDocBatch(spark: SparkSession, root: String, batchId: String,
                     docs: DataFrame, idCol: Column, textCol: Column): Unit = {
    val (postings, stats) = TextOps2.buildBm25Postings(docs, idCol, textCol)
    postings.write.mode("overwrite").parquet(s"$root/postings/ingest=$batchId")
    stats.write.mode("overwrite").parquet(s"$root/stats/ingest=$batchId")
  }

  /** Land EVERY batch of a partitioned corpus in one pass: one
    * tokenize + two partitionBy("ingest") writes instead of 2·|batches|
    * jobs each re-scanning the corpus (guide §1.2: the per-batch loop
    * was |batches| full scans for work that is per-doc). Disk layout
    * and row content are identical to per-batch [[commitDocBatch]]
    * calls — postings/stats are per-doc/per-batch-additive, so the
    * single-pass build commutes with the batch split ([[readIndex]] /
    * [[readIndexAsOf]] read both forms indistinguishably). `batchCol`
    * must be a pure function of the doc row. */
  def commitDocBatches(spark: SparkSession, root: String, docs: DataFrame,
                       idCol: Column, textCol: Column, batchCol: Column): Unit = {
    val (postings, stats) =
      TextOps2.buildBm25PostingsBatched(docs, idCol, textCol, batchCol)
    // Output file sizing (guide §6): un-clustered, every write task holds
    // rows of every batch and partitionBy explodes that into
    // tasks × batches tiny files (measured 96 ~30 KB files at sf0.1 —
    // the read side then pays per-file open cost and listing). The
    // (ingest, doc_id) repartition clusters rows by their target
    // partition dir while keeping a batch spread over multiple tasks
    // (hashing ingest alone would funnel a whole batch through one
    // task at scale); AQE's partition coalescing sizes the shuffle to
    // the advisory bytes, so file count tracks data volume instead of
    // the session's task count.
    postings.repartition(col("ingest"), col("doc_id"))
      .write.partitionBy("ingest").mode("overwrite")
      .parquet(s"$root/postings")
    stats.repartition(col("ingest"))
      .write.partitionBy("ingest").mode("overwrite")
      .parquet(s"$root/stats")
  }

  /** The accumulated index: postings = union of every batch partition
    * (read as one partitioned table), stats = the additive re-sum of
    * the per-batch counter rows. */
  def readIndex(spark: SparkSession, root: String): (DataFrame, DataFrame) = {
    require(fs(spark, root).exists(new Path(s"$root/postings")),
      s"no committed batches under $root")
    val postings = spark.read.parquet(s"$root/postings")
      .select(col("doc_id"), col("token"), col("tf"), col("dl"))
    val stats = spark.read.parquet(s"$root/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("tot_dl")).as("tot_dl"))
    (postings, stats)
  }

  /** §2 row 169 — `documents` ingested as THREE disjoint batches
    * (doc_id mod 3) through real on-disk state, then scored with the
    * standard queries: bit-identical to q_bm25's direct derivation,
    * so the same oracle replays it. */
  def bm25IncrQ(s: SparkSession, d: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_bm25_state").toString
    val docs = Tables.documents(s, d)
    commitDocBatches(s, root, docs, col("doc_id"), col("text"),
      concat(lit("b"), pmod(col("doc_id"), lit(3)).cast("string")))
    val (postings, stats) = readIndex(s, root)
    TextOps2.bm25FromPostings(s, postings, stats, TextOps2.Bm25Queries, k = 10)
  }

  /** Time-travel read (SURVEY.md §2 row 189): the index AS OF a batch
    * set — reproduce last week's retrieval results, bisect a quality
    * regression to the batch that introduced it, or serve a frozen
    * index while new batches land. Costs NOTHING extra at write time:
    * because batches are disjoint partitions keyed by the `ingest`
    * partition column, "as of" is a PARTITION-PRUNED read — the
    * excluded batches' files are never opened (the q_bm25_asof plan
    * shows the pruned PartitionFilters), and stats re-sum only the
    * included counter rows. The contract that makes this exact is the
    * same disjointness that makes accumulation exact: an as-of index
    * EQUALS the direct index built from the included batches' docs. */
  def readIndexAsOf(spark: SparkSession, root: String,
                    batches: Seq[String]): (DataFrame, DataFrame) = {
    require(batches.nonEmpty, "readIndexAsOf: empty batch set")
    require(fs(spark, root).exists(new Path(s"$root/postings")),
      s"no committed batches under $root")
    val postings = spark.read.parquet(s"$root/postings")
      .filter(col("ingest").isin(batches: _*))
      .select(col("doc_id"), col("token"), col("tf"), col("dl"))
    val stats = spark.read.parquet(s"$root/stats")
      .filter(col("ingest").isin(batches: _*))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("tot_dl")).as("tot_dl"))
    (postings, stats)
  }

  /** §2 row 189 — three batches committed, scored AS OF the first two:
    * equals the direct index over doc_id % 3 != 2, which is exactly
    * what the oracle replays. */
  def bm25AsOfQ(s: SparkSession, d: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_bm25_asof").toString
    val docs = Tables.documents(s, d)
    commitDocBatches(s, root, docs, col("doc_id"), col("text"),
      concat(lit("b"), pmod(col("doc_id"), lit(3)).cast("string")))
    val (postings, stats) = readIndexAsOf(s, root, Seq("b0", "b1"))
    TextOps2.bm25FromPostings(s, postings, stats, TextOps2.Bm25Queries, k = 10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25_incr" -> (bm25IncrQ _),
    "q_bm25_asof" -> (bm25AsOfQ _),
  )

  /** Batch disjointness makes the accumulated index equal the direct
    * one, so the incremental query replays with q_bm25's exact
    * oracle. */
  val oracles: Map[String, String] = Map(
    "q_bm25_incr" -> TextOps2.oracles("q_bm25"),
    // the identical scoring chain over the as-of corpus restriction
    "q_bm25_asof" ->
      s"""WITH ${TextOps2.bm25RankCtesOver(
             "(SELECT * FROM documents WHERE doc_id % 3 <> 2) dv")}
         |SELECT qid, doc_id, score_i, rn FROM bm25rank
         |ORDER BY qid, rn""".stripMargin,
  )
}
