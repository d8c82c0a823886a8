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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chunk_docs" -> (chunkDocsQ _),
  )

  val oracles: Map[String, String] = Map(
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
