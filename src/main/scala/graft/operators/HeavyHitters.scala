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
  * The result is therefore EXACT — the sketch only prunes. The
  * candidate set is every item the merged sketch still holds (NO
  * filtering on merged estimates: per-partial estimates never
  * undercount, but an item evicted from one partition's partial
  * contributes zero to the merged sum, so merged estimates can
  * undercount by up to total/capacity and a threshold filter on them
  * could drop a true heavy hitter). Completeness of the unfiltered
  * candidate set is provable:
  * - an item ABSENT from the merged union was evicted from every
  *   partial, so its count per partition is <= n_i/capacity and its
  *   global count is <= total/capacity < total/k whenever
  *   capacity > k — a true heavy hitter cannot be absent;
  * - eval()'s top-`capacity` cut cannot drop one either: a true heavy
  *   hitter's merged est is >= total/k - total/capacity, estimates sum
  *   to <= total, so fewer than capacity items can outrank it for
  *   capacity >= 2k.
  * The default capacity 4k satisfies both with margin. Recounting
  * <= capacity candidates exactly is one broadcast of a few hundred
  * strings — completeness costs nothing measurable.
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
    require(cap >= 2 * k, s"capacity $cap too small for k=$k: completeness needs >= 2k")
    // one pass: the sketch and the exact non-null row count it processed.
    // Every surviving sketch entry is a candidate — see the scaladoc for
    // why filtering on merged estimates here would be unsound.
    val cands = rows
      .agg(topk_freq(tokenCol, cap, cap).as("items"), count(tokenCol).as("total"))
      .select(col("total"), explode(col("items")).as("it"))
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
