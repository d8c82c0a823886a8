package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Association rules over document token sets (SURVEY.md §2 row 180)
  * — the market-basket relation (Agrawal & Srikant, VLDB'94) applied
  * to corpus vocabulary: which terms CO-OCCUR in documents beyond
  * their independent rates. Distinct from row 131's collocations
  * (adjacent-position PMI): association is set-level co-presence at
  * any distance — the topic/jargon structure ("spark" ⇒ "shuffle")
  * that positional statistics cannot see. Per rule x ⇒ y: support
  * (docs containing both), confidence = support/df(x), lift =
  * support·N / (df(x)·df(y)).
  *
  * Exactness: support/df/N are integers; confidence is ONE IEEE
  * division of two integers (parity-safe, the ngramJaccard rule);
  * lift is emitted as the integer pair (lift_num = s·N, lift_den =
  * df_x·df_y) — divide at display. OVERFLOW CONTRACT: df·df < 2^63 ⇒
  * N < 3.03e9 docs (the kappa contract); beyond, pre-scale df by a
  * common factor (lift is scale-free).
  *
  * Scale shape — the Apriori property IS the distribution strategy:
  * only tokens with df ≥ minSup can appear in a qualifying pair, so
  * the per-doc self-join runs on the FREQUENT-token projection only
  * (fan-out per doc = (frequent tokens in doc)², bounded by the
  * frequent vocabulary, not doc length); the frequent-token frame is
  * corpus-frequency-bounded and broadcasts. One distinct pass, one
  * df aggregation, one pair-count aggregation — all map-side
  * combinable; N is a 1-row broadcast (the watermark-scalar posture).
  */
object AssocRules {

  /** (antecedent, consequent, support, df_x, df_y, confidence,
    * lift_num, lift_den) for every rule whose token AND pair support
    * reach minSupPct percent of documents; both directions emitted. */
  def associationRules(docs: DataFrame, idCol: String, textCol: String,
                       minSupPct: Int = 5): DataFrame = {
    require(minSupPct >= 1 && minSupPct <= 100,
      s"minSupPct must be in [1,100], got $minSupPct")
    val dt = docs.select(col(idCol).cast(LongType).as("doc_id"),
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
          .as("token"))
      .distinct()
    val n1 = docs.agg(count(lit(1)).as("n"))
    val freq = dt.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n1))
      .filter(col("df") * 100 >= col("n") * minSupPct)
    val ft = dt.join(broadcast(freq.select(col("token"))), Seq("token"))
    val pairs = ft.select(col("doc_id"), col("token").as("ta"))
      .join(ft.select(col("doc_id"), col("token").as("tb")), Seq("doc_id"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(n1))
      .filter(col("support") * 100 >= col("n") * minSupPct)
    val both = pairs.select(col("ta").as("antecedent"), col("tb").as("consequent"),
        col("support"), col("n"))
      .unionAll(pairs.select(col("tb"), col("ta"), col("support"), col("n")))
    both
      .join(broadcast(freq.select(col("token").as("antecedent"), col("df").as("df_x"))),
        Seq("antecedent"))
      .join(broadcast(freq.select(col("token").as("consequent"), col("df").as("df_y"))),
        Seq("consequent"))
      .select(col("antecedent"), col("consequent"), col("support"),
        col("df_x"), col("df_y"),
        (col("support").cast(DoubleType) / col("df_x")).as("confidence"),
        (col("support") * col("n")).as("lift_num"),
        (col("df_x") * col("df_y")).as("lift_den"))
  }

  /** §2 row 180 — rules at 5% minimum support over documents. */
  def assocQ(s: SparkSession, d: String): DataFrame =
    associationRules(Tables.documents(s, d), "doc_id", "text", minSupPct = 5)
      .orderBy(col("antecedent"), col("consequent"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_assoc_rules" -> (assocQ _))

  val oracles: Map[String, String] = Map(
    // same distinct/df/pair pipeline; integer thresholds via the
    // df*100 >= n*pct cross-multiplication (no rounding ambiguity);
    // HUGEINT products emitted BIGINT, confidence as the single
    // integer division both engines evaluate identically
    "q_assoc_rules" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
        |    FROM documents) u),
        |n1 AS (SELECT COUNT(*) AS n FROM documents),
        |freq AS (
        |  SELECT token, COUNT(*) AS df FROM dt GROUP BY token
        |  HAVING COUNT(*) * 100 >= (SELECT n FROM n1) * 5),
        |ft AS (SELECT dt.doc_id, dt.token FROM dt JOIN freq USING (token)),
        |pairs AS (
        |  SELECT a.token AS ta, b.token AS tb, COUNT(*) AS support
        |  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.token < b.token
        |  GROUP BY 1, 2
        |  HAVING COUNT(*) * 100 >= (SELECT n FROM n1) * 5),
        |bi AS (
        |  SELECT ta AS antecedent, tb AS consequent, support FROM pairs
        |  UNION ALL
        |  SELECT tb, ta, support FROM pairs)
        |SELECT b.antecedent, b.consequent,
        |  CAST(b.support AS BIGINT) AS support,
        |  CAST(fx.df AS BIGINT) AS df_x, CAST(fy.df AS BIGINT) AS df_y,
        |  CAST(b.support AS DOUBLE) / fx.df AS confidence,
        |  CAST(b.support * n1.n AS BIGINT) AS lift_num,
        |  CAST(fx.df * fy.df AS BIGINT) AS lift_den
        |FROM bi b
        |JOIN freq fx ON fx.token = b.antecedent
        |JOIN freq fy ON fy.token = b.consequent
        |CROSS JOIN n1
        |ORDER BY b.antecedent, b.consequent""".stripMargin)
}
