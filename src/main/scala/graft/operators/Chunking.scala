package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Document chunking for embedding pipelines (SURVEY.md §9): fixed
  * token windows with overlap (stride = size - overlap). Trailing
  * windows fully contained in the previous chunk are dropped, so every
  * emitted chunk contributes at least one new token. Pure
  * sequence/slice expressions; one explode, no shuffle before the
  * write.
  */
object Chunking {

  /** Explode into (carry cols, chunk_id, chunk_text, n_tokens). */
  def chunk(df: DataFrame, textCol: String, chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap < chunkSize, "overlap must be < chunkSize")
    val stride = chunkSize - overlap
    val toks = TextFunctions.tokens(col(textCol))
    // chunk starts: 1, 1+stride, 1+2*stride, ... while start <= n
    // (last chunk may be short; empty docs yield no chunks)
    val starts = sequence(lit(1), greatest(size(toks), lit(1)), lit(stride))
    df.withColumn("__toks", toks)
      .withColumn("start", explode(starts))
      // a trailing start within `overlap` of the end would yield a chunk
      // fully contained in the previous one — drop it (the first chunk
      // always survives so short docs still chunk)
      .filter((col("start") === 1 && size(col("__toks")) > 0) ||
              col("start") <= size(col("__toks")) - overlap)
      .withColumn("chunk_id", ((col("start") - 1) / stride).cast(LongType))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__toks"), col("start"), lit(chunkSize))))
      .withColumn("n_tokens",
        least(lit(chunkSize), size(col("__toks")) - col("start") + 1).cast(LongType))
      .drop("__toks", "start")
  }

  /** Chunk the corpus: 32-token windows, 8-token overlap. */
  def chunkDocsQ(s: SparkSession, d: String): DataFrame =
    chunk(Tables.documents(s, d).select(col("doc_id"), col("text")),
        "text", chunkSize = 32, overlap = 8)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"), col("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** TextTiling-style topic-shift segmentation (SURVEY.md §2 row 279,
    * Hearst 1997) — the SEMANTIC chunk-boundary signal the fixed
    * windows above ignore: at every w-word boundary, cohesion =
    * |vocab(left w words) ∩ vocab(right w words)| (an exact integer —
    * no cosine needed at this granularity), and a boundary that is a
    * strict LOCAL MINIMUM of cohesion (a valley) marks a topic shift
    * — the place a RAG chunker should cut instead of mid-topic.
    * Boundaries live at i·w for i ∈ [1, ⌊len/w⌋−1], so both windows
    * are always full. Pure per-row array expressions (slice /
    * array_distinct / array_intersect over the plan) + one
    * posexplode; ZERO shuffles before the sink. The sequence(1, nb)
    * guard matters: Spark's sequence DESCENDS when nb = 0. */
  def textTiling(df: DataFrame, idCol: String, textCol: String,
                 w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    // a NULL doc has no boundaries: the shared null-guarded tokenizer
    // (TextFunctions.wsTokens) folds NULL to the empty token array
    val ws = graft.functions.TextFunctions.wsTokens(col(textCol))
    val nb = greatest((size(ws) / w).cast(IntegerType) - 1, lit(0))
    val cohs = when(nb >= 1,
      transform(sequence(lit(1), nb), i =>
        size(array_intersect(
          array_distinct(slice(ws, (i - 1) * w + 1, lit(w))),
          array_distinct(slice(ws, i * w + 1, lit(w)))))))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol).as("doc_id"), cohs.as("__cohs"))
      .select(col("doc_id"), col("__cohs"),
        posexplode(col("__cohs")).as(Seq("__bi", "cohesion")))
      .select(col("doc_id"),
        ((col("__bi") + 1) * w).cast(LongType).as("boundary_pos"),
        col("cohesion").cast(LongType).as("cohesion"),
        (col("__bi") > 0 && col("__bi") < size(col("__cohs")) - 1 &&
          col("cohesion") < element_at(col("__cohs"), col("__bi")) &&
          col("cohesion") < element_at(col("__cohs"), col("__bi") + 2))
          .as("is_valley"))
  }

  /** §2 row 279 — 20-word tiling over documents. */
  def textTilingQ(s: SparkSession, d: String): DataFrame =
    textTiling(Tables.documents(s, d), "doc_id", "text", w = 20)
      .orderBy(col("doc_id"), col("boundary_pos"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chunk_docs" -> (chunkDocsQ _),
    "q_text_tiling" -> (textTilingQ _),
  )

  val oracles: Map[String, String] = Map(
    // same windows via 1-based INCLUSIVE list slices (ws[a : a+w-1]
    // == Spark's slice(ws, a, w)); valleys by direct list indexing
    "q_text_tiling" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, ws,
        |    greatest(CAST(len(ws) // 20 AS BIGINT) - 1, 0) AS nb
        |  FROM w),
        |ch AS (
        |  SELECT doc_id,
        |    list_transform(range(1, nb + 1), i ->
        |      len(list_intersect(
        |        list_distinct(ws[(i-1)*20+1 : (i-1)*20+20]),
        |        list_distinct(ws[i*20+1 : i*20+20])))) AS cohs
        |  FROM c),
        |e AS (
        |  SELECT doc_id, cohs,
        |    unnest(cohs) AS cohesion,
        |    unnest(range(1, len(cohs) + 1)) AS i
        |  FROM ch)
        |SELECT doc_id, CAST(i * 20 AS BIGINT) AS boundary_pos,
        |  CAST(cohesion AS BIGINT) AS cohesion,
        |  (i > 1 AND i < len(cohs)
        |   AND cohesion < cohs[CAST(i AS INT) - 1]
        |   AND cohesion < cohs[CAST(i AS INT) + 1]) AS is_valley
        |FROM e
        |ORDER BY doc_id, boundary_pos""".stripMargin,

    // stride 24, size 32: starts are 1-based indexes 1, 25, 49, ...
    "q_chunk_docs" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+', 0) AS toks
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, toks,
        |    UNNEST(range(1, greatest(len(toks), 1) + 1, 24)) AS start
        |  FROM t)
        |SELECT doc_id,
        |  CAST((start - 1) / 24 AS BIGINT) AS chunk_id,
        |  CAST(least(32, len(toks) - start + 1) AS BIGINT) AS n_tokens,
        |  array_to_string(toks[start : start + 31], ' ') AS chunk_text
        |FROM st
        |WHERE (start = 1 AND len(toks) > 0) OR start <= len(toks) - 8
        |ORDER BY doc_id, chunk_id""".stripMargin,
  )
}
