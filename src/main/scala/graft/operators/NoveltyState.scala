package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Incremental novelty state (SURVEY.md §2 row 149) — the first-seen
  * shingle-hash table that lets a daily ingest score batch novelty
  * (row 145) while reading ZERO corpus text: the delta-append posture
  * (StateStore / GraphState / Boilerplate rows 93/139/126) applied to
  * the novelty signal.
  *
  * State algebra: rows are (h, first_id) and the reader's merge is
  * MIN(first_id) per hash — commutative, associative and IDEMPOTENT
  * (the HLL-max property, with min): commits never read prior state
  * (O(batch) write bytes), re-appending a batch rewrites its own
  * partition with identical rows, batches may land out of order, and
  * the merged state still equals the full-corpus first-seen map
  * because "first" is defined by DOC ID, not arrival time — exactly
  * the recompute's fixpoint, so state-fed scores are bit-identical to
  * [[TextOps.noveltyScores]] on the union (the q_novelty_incr gate
  * proves it through real on-disk state).
  *
  * Scale shape: a commit is one map-side-combined aggregation of the
  * batch's (id, hash) projection; scoring joins the batch's hashes
  * against the state on h — ids+hash only on every wire, and a
  * h-bucketed state layout (row 122) removes the state-side exchange.
  * Caller contract: score only docs whose batch has been committed
  * (an uncommitted doc's unseen hashes would silently drop out of the
  * inner join).
  *
  * MEASURED trade (ScaleProbe nov_ingest/nov_full, honest negative):
  * on the synthetic bench corpus the full recompute restricted to the
  * batch stays CHEAPER (~0.9 s vs ~1.5-1.9 s, both flat over a 16×
  * corpus — Catalyst prunes the recompute's final per-doc aggregate
  * to batch rows). Why: these docs are ~0.5 KB with ~90 distinct
  * shingles, so the state table is nearly the size of the text it
  * replaces and the ingest's parquet round-trip buys no byte
  * reduction. The state path wins where real corpora live — documents
  * of tens of KB whose distinct-hash table is a small fraction of the
  * text — and when the state is kept compacted/bucketed so the
  * min-reduce is a layout-free scan.
  */
object NoveltyState {

  /** Land one batch's candidate first-occurrences (min doc id per
    * hash within the batch) as the batch's own partition. Never reads
    * existing state; retrying a batchId overwrites only itself. */
  def commitNoveltyDelta(spark: SparkSession, batch: DataFrame,
                         idCol: String, textCol: String,
                         root: String, batchId: String): Unit = {
    require(batchId.nonEmpty && !batchId.contains("/"),
      s"batchId must be a plain name, got '$batchId'")
    TextOps.docShingleHashes(batch, idCol, textCol)
      .groupBy(col("h")).agg(min(col("__id")).as("first_id"))
      .write.mode("overwrite").parquet(s"$root/first_seen/ingest=$batchId")
  }

  /** The merged first-seen map: one min-aggregation over the delta
    * table (distinct-hash bounded). */
  def stateFrom(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/first_seen")
      .groupBy(col("h")).agg(min(col("first_id")).as("first_id"))

  /** Score `docs` (already committed) against the merged state:
    * identical output schema and values to noveltyScores on the full
    * committed union, restricted to `docs`. */
  def scoreAgainstState(state: DataFrame, docs: DataFrame,
                        idCol: String, textCol: String): DataFrame =
    TextOps.docShingleHashes(docs, idCol, textCol)
      .join(state, "h")
      .groupBy(col("__id").as("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") === col("__id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_pct",
        GraphOps.fdiv(lit(100L) * col("n_novel"), col("n_shingles")))

  /** §2 row 149 — the corpus (doc_id % 4 != 0) and a batch (% 4 == 0)
    * committed as separate deltas, the batch scored against the merged
    * on-disk state: bit-identical to the full-corpus novelty restricted
    * to the batch, so the q_novelty oracle replays it with one WHERE. */
  def noveltyIncrQ(s: SparkSession, d: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_novelty_state").toString
    val docs = Tables.documents(s, d)
    commitNoveltyDelta(s, docs.filter(pmod(col("doc_id"), lit(4)) =!= 0),
      "doc_id", "text", root, "corpus")
    commitNoveltyDelta(s, docs.filter(pmod(col("doc_id"), lit(4)) === 0),
      "doc_id", "text", root, "b1")
    scoreAgainstState(stateFrom(s, root),
        docs.filter(pmod(col("doc_id"), lit(4)) === 0), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_novelty_incr" -> (noveltyIncrQ _),
  )

  /** First-seen is arrival-order-free, so the incremental path replays
    * with the FULL-corpus novelty oracle restricted to the batch. */
  val oracles: Map[String, String] = Map(
    "q_novelty_incr" -> TextOps.noveltySql("WHERE doc_id % 4 = 0"),
  )
}
