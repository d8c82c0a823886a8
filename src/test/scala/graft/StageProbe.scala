package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe: per-stage wall times of the two pipeline capstones
  * (the Bench stage probe decomposes only the incremental run;
  * this also splits the full/bootstrap run) — optimization-round
  * instrumentation, not part of the driver surface.
  *
  * Usage: Test/runMain graft.StageProbe [sfDir] */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    // warm the JVM/codegen once so stage numbers measure execution
    graft.operators.TrainingPipeline.stagedTimings(spark, sfDir, incremental = true)
    spark.sharedState.cacheManager.clearCache()
    for (incr <- Seq(true, false)) {
      val ts = graft.operators.TrainingPipeline.stagedTimings(spark, sfDir, incr)
      println(s"STAGEPROBE incremental=$incr " + ts.map {
        case (k, v) => f"$k=$v%.2f" }.mkString(" "))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
