package graft

import org.apache.spark.sql.SparkSession

import org.apache.spark.sql.functions._

import graft.operators.TrainingPipeline
import graft.sources.Tables

/** Where q_incremental_pipeline's wall time goes: bootstrap vs ingest,
  * cold vs warm (same JVM, codegen + exchange caches hot). Run with
  * `sbt "Test/runMain graft.IngestPhaseProbe"`. */
object IngestPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { round =>
      val docs = Tables.documents(spark, sfDir)
        .withColumn("__src_n", substring(col("source"), 4, 10).cast("int"))
      val (corpus, batch) =
        (docs.filter(col("__src_n") < 15), docs.filter(col("__src_n") >= 15))
      val st = t(s"r$round bootstrapState+materialize") {
        val s = TrainingPipeline.bootstrapState(corpus)
        // force the persists the way the ingest's first action would
        Seq(s.hashes, s.sigs, s.labels, s.shingles, s.manifest).foreach(_.count())
        s
      }
      val delta = t(s"r$round runIncremental") {
        TrainingPipeline.runIncremental(st, batch)
      }
      t(s"r$round materialize delta") {
        delta.accepted.count(); delta.tombstones.count()
      }
      // drop the persisted frames so round 2 recomputes (codegen stays warm)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
