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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_match" -> (fuzzyMatchQ _),
  )

  val oracles: Map[String, String] = Map(
    "q_fuzzy_match" ->
      """WITH p AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM p a JOIN p b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
  )
}
