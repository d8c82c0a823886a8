package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.PolyHash64
import graft.sources.Tables

/** Split-document stitching candidates (SURVEY.md §2 row 192) — find
  * (a, b) pairs where the LAST w tokens of a equal the FIRST w tokens
  * of b: the reassembly signal for documents a crawler or extractor
  * split (paginated articles, chunked PDFs, truncated-and-continued
  * posts). Dedup treats the halves as distinct docs forever; training
  * on them teaches mid-sentence truncation — stitching is the
  * upstream repair, and this operator produces its work list.
  *
  * Scale shape: each doc contributes ONE (head-key, tail-key) row —
  * corpus-linear, text reduced to two w-token boundary strings before
  * any shuffle; candidates come from ONE equi-join keyed on the
  * domain-prefixed poly_hash64 of the boundary string, with the
  * string equality verified IN the join condition (hash joins route
  * the shuffle; the verify makes collisions harmless — the
  * minhash-then-verify posture). Docs shorter than w tokens carry no
  * unambiguous boundary evidence and are excluded by contract. */
object Stitch {

  def stitchCandidates(docs: DataFrame, idCol: String, textCol: String,
                       w: Int): DataFrame = {
    require(w >= 1, s"w must be >= 1, got $w")
    val toks = docs.select(col(idCol).cast(LongType).as("id"),
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)).as("l"))
      .filter(size(col("l")) >= w)
    val keyed = toks.select(col("id"),
      array_join(slice(col("l"), 1, w), " ").as("head"),
      array_join(slice(col("l"), -w, w), " ").as("tail"))
    val tails = keyed.select(col("id").as("id_a"), col("tail"),
      PolyHash64.poly_hash64(concat(lit("stitch|"), col("tail"))).as("h"))
    val heads = keyed.select(col("id").as("id_b"), col("head"),
      PolyHash64.poly_hash64(concat(lit("stitch|"), col("head"))).as("h_b"))
    tails.join(heads,
        col("h") === col("h_b") && col("tail") === col("head") &&
          col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("tail").as("overlap"))
  }

  /** Registered query: split pairs are seeded IN BOTH ENGINES — every
    * doc_id ≡ 0 (mod 10) gets a 5-token bridge appended and its
    * successor gets the same bridge prepended (the bridge embeds the
    * pair id, so pairs cannot cross-match) — and the corpus's own
    * boundary collisions, if any, surface identically on both sides. */
  def stitchQ(s: SparkSession, d: String): DataFrame = {
    val bridge = concat(lit("br"), (col("doc_id") - pmod(col("doc_id"), lit(10)))
      .cast(StringType), lit(" one two three four"))
    val seeded = Tables.documents(s, d)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) === 0,
          concat(col("text"), lit(" "), bridge))
          .when(pmod(col("doc_id"), lit(10)) === 1,
            concat(bridge, lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
    stitchCandidates(seeded, "doc_id", "text", w = 5)
      .orderBy(col("id_a"), col("id_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stitch" -> (stitchQ _))

  val oracles: Map[String, String] = Map(
    // same seeding; boundary slices via list ranges; the join on the
    // boundary STRING itself (the hash only routes the engine's
    // shuffle — string equality is the relation)
    "q_stitch" ->
      """WITH seeded AS (SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 THEN text || ' br' ||
        |           CAST(doc_id - ((doc_id % 10 + 10) % 10) AS VARCHAR) || ' one two three four'
        |         WHEN doc_id % 10 = 1 THEN 'br' ||
        |           CAST((doc_id - 1) - (((doc_id - 1) % 10 + 10) % 10) AS VARCHAR) ||
        |           ' one two three four ' || text
        |         ELSE text END AS text
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS l
        |  FROM seeded),
        |keyed AS (
        |  SELECT doc_id,
        |    array_to_string(l[1:5], ' ') AS head,
        |    array_to_string(l[len(l)-4:len(l)], ' ') AS tail
        |  FROM tk WHERE len(l) >= 5)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.tail AS overlap
        |FROM keyed a JOIN keyed b
        |  ON a.tail = b.head AND a.doc_id <> b.doc_id
        |ORDER BY id_a, id_b""".stripMargin)
}
