package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, VectorOps}
import graft.sources.Tables

/** Parameter sweep for the approximate-NN paths: recall@5 vs the exact
  * baseline and wall time, across LSH (tables x planes) and IVF
  * (k x nprobe). Run: sbt "Test/runMain graft.AnnSweep [sfDir]". */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = TestSpark.spark
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val cands = e.filter($"vec_id" >= 10).cache()
    val qs = e.filter($"vec_id" < 10).cache()
    cands.count(); qs.count()

    val exact = VectorOps.bruteForceTopK(cands, qs, "vec_id", "embedding", 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet

    def timeRecall(name: String)(f: => Set[(Long, Long)]): Unit = {
      val t0 = System.nanoTime()
      val got = f
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = exact.count(got.contains).toDouble / exact.size
      println(f"SWEEP $name%-28s recall=${recall}%.3f cand_pairs=${got.size}%6d time=${secs}%.2fs")
    }

    for (tables <- Seq(4, 8, 16); planes <- Seq(3, 4, 6)) {
      timeRecall(s"lsh tables=$tables planes=$planes") {
        VectorOps.lshTopK(cands, qs, "vec_id", "embedding", 5, tables, planes)
          .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      }
    }
    for (k <- Seq(8, 16, 32); nprobe <- Seq(2, 4, 8) if nprobe < k) {
      val centroids = IvfIndex.trainCentroids(cands, "vec_id", "embedding", k, 2)
      timeRecall(s"ivf k=$k nprobe=$nprobe") {
        IvfIndex.ivfTopK(cands, qs, "vec_id", "embedding", 5, centroids, nprobe)
          .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      }
    }
    spark.stop()
  }
}
