package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25State, TextOps2}

/** Incremental BM25 postings state (SURVEY.md §2 row 169): batch
  * accumulation equals the direct index, retries are idempotent,
  * later batches extend retrieval. */
class Bm25StateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark shuffles data across the cluster"),
    (2L, "bm25 ranks documents by term saturation"),
    (3L, "the postings table maps tokens to documents"),
    (4L, "incremental state avoids re reading the corpus"),
    (5L, "term frequency saturates under bm25"),
    (6L, "")
  ).toDF("doc_id", "text")

  private def tmp() =
    java.nio.file.Files.createTempDirectory("bm25_state_spec").toString

  private val qs = Seq((1L, "bm25 term"), (2L, "postings corpus"))

  test("batch-accumulated index equals the direct derivation") {
    val root = tmp()
    Bm25State.commitDocBatch(spark, root, "a",
      corpus.filter($"doc_id" <= 3), $"doc_id", $"text")
    Bm25State.commitDocBatch(spark, root, "b",
      corpus.filter($"doc_id" > 3), $"doc_id", $"text")
    val (p, st) = Bm25State.readIndex(spark, root)
    val incr = TextOps2.bm25FromPostings(spark, p, st, qs, k = 10).collect().toSeq
    val (dp, dst) = TextOps2.buildBm25Postings(corpus, $"doc_id", $"text")
    val direct = TextOps2.bm25FromPostings(spark, dp, dst, qs, k = 10).collect().toSeq
    assert(incr == direct && incr.nonEmpty)
    // the token-free doc still counts: stats include all 6 docs
    assert(st.head().getLong(0) == 6L)
  }

  test("re-committing a batch is idempotent") {
    val root = tmp()
    Bm25State.commitDocBatch(spark, root, "a",
      corpus.filter($"doc_id" <= 3), $"doc_id", $"text")
    Bm25State.commitDocBatch(spark, root, "b",
      corpus.filter($"doc_id" > 3), $"doc_id", $"text")
    val before = {
      val (p, st) = Bm25State.readIndex(spark, root)
      TextOps2.bm25FromPostings(spark, p, st, qs, k = 10).collect().toSeq
    }
    // retry batch "b" (same content) — nothing may change
    Bm25State.commitDocBatch(spark, root, "b",
      corpus.filter($"doc_id" > 3), $"doc_id", $"text")
    val after = {
      val (p, st) = Bm25State.readIndex(spark, root)
      TextOps2.bm25FromPostings(spark, p, st, qs, k = 10).collect().toSeq
    }
    assert(before == after)
  }

  test("a later batch makes its documents retrievable") {
    val root = tmp()
    Bm25State.commitDocBatch(spark, root, "a",
      corpus.filter($"doc_id" <= 3), $"doc_id", $"text")
    def hits(q: String) = {
      val (p, st) = Bm25State.readIndex(spark, root)
      TextOps2.bm25FromPostings(spark, p, st, Seq((1L, q)), k = 10)
        .select($"doc_id").as[Long].collect().toSet
    }
    assert(!hits("incremental state").contains(4L))
    Bm25State.commitDocBatch(spark, root, "b",
      corpus.filter($"doc_id" > 3), $"doc_id", $"text")
    assert(hits("incremental state").contains(4L))
  }

  test("as-of read equals the direct index over the included batches") {
    val root = tmp()
    Bm25State.commitDocBatch(spark, root, "a",
      corpus.filter($"doc_id" <= 3), $"doc_id", $"text")
    Bm25State.commitDocBatch(spark, root, "b",
      corpus.filter($"doc_id" > 3), $"doc_id", $"text")
    val (p, st) = Bm25State.readIndexAsOf(spark, root, Seq("a"))
    val asOf = TextOps2.bm25FromPostings(spark, p, st, qs, k = 10).collect().toSeq
    val (dp, dst) = TextOps2.buildBm25Postings(
      corpus.filter($"doc_id" <= 3), $"doc_id", $"text")
    val direct = TextOps2.bm25FromPostings(spark, dp, dst, qs, k = 10).collect().toSeq
    assert(asOf == direct && asOf.nonEmpty)
    assert(st.head().getLong(0) == 3L, "stats re-sum only the included batches")
  }

  test("as-of read prunes the excluded batch partitions at the scan") {
    val root = tmp()
    Bm25State.commitDocBatch(spark, root, "a",
      corpus.filter($"doc_id" <= 3), $"doc_id", $"text")
    Bm25State.commitDocBatch(spark, root, "b",
      corpus.filter($"doc_id" > 3), $"doc_id", $"text")
    val (p, _) = Bm25State.readIndexAsOf(spark, root, Seq("a"))
    val plan = p.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ingest"), plan)
    // the pruned scan must expose only the included partition's files
    val scanned = p.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("ingest=b") || scanned.contains("ingest=a"), scanned)
  }
}
