package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Warc

/** Streaming WARC landing (SURVEY.md §2 row 263) — the container
  * reader (row 254) as a CONTINUOUS ingest stage: a stream of
  * (file, warc) archive strings (the shape a directory `readStream`
  * or a fetcher's output queue delivers) is split into records,
  * HTTP headers stripped, and per-record text metrics computed —
  * all STATELESS per-row projections, so the transform runs in
  * append mode with no watermark, no state store, and no shuffle:
  * identical logical work per row in batch and streaming, which the
  * spec pins as literal batch==stream output equality.
  *
  * Downstream stages pick their own statefulness: row 216's TTL
  * dedup on the content hash, row 90's corpus ingest for the
  * accepted rows — this stage is the stateless front that feeds
  * them. */
object WarcStream {

  /** Records + per-record landing metrics of a (file, warc) frame —
    * batch OR streaming (the plan is identical; nothing here is
    * stateful). */
  def landing(files: DataFrame): DataFrame =
    Warc.records(files, "file", "warc")
      .withColumn("body_text", Warc.httpBody(col("body")))
      .select(col("file"), col("rec_pos"), col("rec_type"), col("uri"),
        col("content_length"), col("ok"),
        length(col("body_text")).cast("long").as("n_chars"),
        TextFunctions.tokenCount(col("body_text")).as("n_tokens"),
        TextFunctions.langId(col("body_text")).as("predicted_lang"))
}
