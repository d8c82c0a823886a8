package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Contamination, TextOps, TrainingOps}
import graft.sources.Tables

/** MEASURED shuffle volume for the claims the scale Scaladocs assert
  * qualitatively ("reduced map-side", "ids+hash only through the
  * shuffle"): execute the plan, then sum `shuffle bytes written`
  * across every exchange in the executed plan. AQE is disabled inside
  * each measurement so the plan is static (plain ShuffleExchangeExec
  * nodes, no query-stage wrappers/reuse to double-count); the byte
  * comparison targets map-side behavior AQE does not change. */
class ShuffleBytesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def shuffleBytes(df: DataFrame): Long = {
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      self +: self.children.flatMap(walk)
    }
    TestSpark.withConf("spark.sql.adaptive.enabled" -> "false") {
      // execute THIS queryExecution (df.count() would build and run a
      // separate plan, leaving these metrics untouched)
      df.queryExecution.toRdd.count()
      walk(df.queryExecution.executedPlan).collect {
        case s: ShuffleExchangeExec =>
          s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
      }.sum
    }
  }

  // The symmetric self-decon (q_decon_bloom's config) is NOT the shape
  // where the bloom wins bytes: there the plain path's distinct is
  // co-partitioned with the shingle window (free), and the window
  // exchange dominates both paths — measured: bloom 3.73 MB vs plain
  // 3.19 MB at sf0.1. The bloom's byte win is the ASYMMETRIC screen
  // (row 120): a tiny fixed eval index against a large batch, where the
  // prefilter empties the batch side of the h-join. That is what this
  // test measures.
  test("eval-index screen: the bloom prefilter shrinks the join exchange") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sbspec_idx").toString
    val eval = Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") % 10 === 0)
    Contamination.writeEvalIndex(eval, "doc_id", "text", dir)
    val batch = Tables.documents(spark, "/root/testdata/sf0.1")
    // model the at-scale shape: a real eval set's hash table (millions
    // of shingles) exceeds the broadcast threshold, so the h-join
    // shuffles BOTH sides — at test size Spark would auto-broadcast the
    // tiny table and neither path would shuffle it at all (measured:
    // byte-identical plans). The explicit broadcast of the bloom BITSET
    // inside the screen is unaffected.
    TestSpark.withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
    val bloomed = shuffleBytes(
      Contamination.screenAgainstIndex(spark, batch, "doc_id", "text", dir))
    // the identical screen with the prefilter removed: every distinct
    // batch shingle crosses the h-join exchange
    val plain = {
      val hashes = spark.read.parquet(s"$dir/hashes")
      val sh = TextFunctions.shingleRows(
          batch.select(col("doc_id").as("train_id"), col("text").as("__text")),
          Seq(col("train_id")), col("__text"), n = 8)
        .select(col("train_id"), xxhash64(col("sh")).as("h"))
        .distinct()
      shuffleBytes(sh.join(hashes, "h")
        .groupBy(col("train_id"), col("eval_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 1))
    }
    assert(bloomed > 0 && plain > 0)
    assert(bloomed < plain,
      s"bloomed=$bloomed plain=$plain — the prefilter should empty the batch side of the join")
    }
  }

  test("novelty shuffles hashes, not shingle strings") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val hashed = shuffleBytes(
      TextOps.noveltyScores(docs, "doc_id", "text"))
    // the naive formulation: identical semantics, shingle STRINGS on
    // every exchange
    val stringy = {
      import org.apache.spark.sql.expressions.Window
      val sh = TextFunctions.shingleRows(
        docs.select(col("doc_id").as("__id"), col("text").as("__t")),
        Seq(col("__id")), col("__t"), n = 3, out = "sh")
      val dh = sh.select(col("__id"), col("sh")).distinct()
      val w = Window.partitionBy(col("sh"))
      shuffleBytes(dh.withColumn("first_id", min(col("__id")).over(w))
        .groupBy(col("__id").as("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_id") === col("__id"), 1L).otherwise(0L)).as("n_novel")))
    }
    assert(hashed > 0 && stringy > 0)
    assert(hashed < stringy,
      s"hashed=$hashed stringy=$stringy — the hash projection should shrink every exchange")
  }
}
