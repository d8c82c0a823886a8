package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFunctions
import graft.plans.SpaceSavingTopK.topk_freq

/** Streaming frequent items (SURVEY §11 backlog): the same
  * [[graft.plans.SpaceSavingTopK]] sketch that powers the batch
  * heavy-hitters path, inside a Structured Streaming aggregation. The
  * sketch buffer IS the streaming state — O(capacity) per aggregate
  * regardless of how many tokens stream through, which is exactly the
  * bounded-state property a weeks-long ingest needs (an exact
  * streaming groupBy-count would grow state with the distinct tail).
  *
  * Complete output mode: the sketch is re-emitted each trigger; with
  * `capacity` above the live cardinality the emitted counts are exact
  * and equal the batch result (the parity the spec pins). */
object TokenStream {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docsSchema).parquet(dir)

  /** Identical logic batch or stream: casefolded words → Space-Saving
    * top-k. */
  def topTokens(docs: DataFrame, k: Int, capacity: Int): DataFrame =
    docs.select(explode(TextFunctions.words(col("text"))).as("token"))
      .agg(topk_freq(col("token"), k, capacity).as("top"))
      .select(explode(col("top")).as("it"))
      .select(col("it.item").as("token"), col("it.cnt").as("cnt"))

  def startMemorySink(spark: SparkSession, dir: String, name: String,
                      k: Int = 10, capacity: Int = 64): StreamingQuery =
    topTokens(readDocs(spark, dir), k, capacity)
      .writeStream.outputMode("complete").format("memory").queryName(name).start()
}
