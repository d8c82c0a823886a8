package graft

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler: replay the batch or incremental pipeline
  * with every stage boundary forced and timed
  * ([[graft.operators.TrainingPipeline.stagedTimings]]), N reps, so an
  * optimization A/B localizes to a stage. Not part of the driver
  * surface.
  *
  * Usage: Test/runMain graft.StageProbe <sfDir> <reps> <batch|incr> */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, repsS, mode) = args
    val reps = repsS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    (1 to reps).foreach { r =>
      val ts = graft.operators.TrainingPipeline.stagedTimings(
        spark, sfDir, incremental = mode == "incr")
      spark.sharedState.cacheManager.clearCache()
      println(f"STAGE rep=$r total=${ts.map(_._2).sum}%.2f " +
        ts.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
