package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.SpaceSavingTopK.topk_freq
import graft.sources.Tables

/** SURVEY.md §2.5 — exact frequent items at sketch cost: the
  * candidate-then-verify pattern (same architecture as MinHash-LSH →
  * exact-Jaccard), built on the existing [[graft.plans.SpaceSavingTopK]]
  * aggregate. Pass 1 runs the sketch — O(capacity) state per partition,
  * a few KB through the shuffle where a plain groupBy would shuffle
  * every distinct item in the tail. Pass 2 recounts ONLY the candidates
  * exactly (broadcast semi-join, then a groupBy whose key set is at
  * most `capacity` items) and applies the threshold to exact counts.
  *
  * The result is therefore EXACT — the sketch only prunes. Candidate
  * completeness is provable, not probabilistic:
  * - Space-Saving estimates never undercount, and the merge unions
  *   partials without truncation (SpaceSavingTopK.merge), so any item
  *   with true count >= total/k has est >= total/k;
  * - stored estimates sum to exactly the processed row count (each
  *   update adds net +1 whether it hits, inserts, or evicts), so at
  *   most k items can have est >= total/k — with `capacity >= k` the
  *   top-`capacity` cut of eval() cannot drop a true heavy hitter.
  *
  * At 100 TB the win is the unshuffled tail: a web-scale token column
  * has billions of distinct rare tokens that never leave their map
  * task.
  */
object HeavyHitters {

  /** Items of `tokenCol` whose exact count `cnt` satisfies
    * `cnt * k >= total` (i.e. frequency >= 1/k), with exact counts. */
  def heavyHitters(rows: DataFrame, tokenCol: Column, k: Int,
                   capacity: Int = 0): DataFrame = {
    require(k > 1, s"k must exceed 1, got $k")
    val cap = if (capacity > 0) capacity else 4 * k
    require(cap >= k, s"capacity $cap too small for k=$k: completeness needs >= k")
    // one pass: the sketch and the exact non-null row count it processed
    val sketch = rows
      .agg(topk_freq(tokenCol, cap, cap).as("items"), count(tokenCol).as("total"))
      .select(col("total"), explode(col("items")).as("it"))
    val cands = sketch.filter(col("it.cnt") * k >= col("total"))
      .select(col("it.item").as("token"), col("total"))
    rows.select(tokenCol.as("token"))
      .join(broadcast(cands), Seq("token"))
      .groupBy(col("token"), col("total"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k >= col("total"))
      .select(col("token"), col("cnt"))
  }

  /** §2.5 — tokens covering >= 1% of the corpus word stream, exact
    * counts (k=100; sketch capacity 400). */
  def heavyHittersQ(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(TextFunctions.words(col("text"))).as("token"))
    heavyHitters(toks, col("token"), k = 100).orderBy(col("token"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> (heavyHittersQ _),
  )

  val oracles: Map[String, String] = Map(
    "q_heavy_hitters" ->
      """WITH w AS (SELECT regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
        |           FROM documents),
        |tok AS (SELECT unnest(ws) AS token FROM w),
        |tot AS (SELECT COUNT(*) AS n FROM tok),
        |c AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1)
        |SELECT token, CAST(cnt AS BIGINT) AS cnt
        |FROM c, tot
        |WHERE cnt * 100 >= n
        |ORDER BY token""".stripMargin,
  )
}
