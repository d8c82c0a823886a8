package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only job profiler: run one registered query and print every
  * Spark job's wall-clock with its description — separates "few big
  * jobs" (stage work) from "many tiny jobs" (driver cadence) when
  * deciding what to optimize. Not part of the driver surface.
  *
  * Usage: Test/runMain graft.JobProbe <sfDir> <reps> <query> */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, repsS, name) = args
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
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown $name"))
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          rows.add((je.jobId, (je.time - t0) / 1e3, desc))
        }
      }
    }
    (1 to reps).foreach { r =>
      starts.clear(); rows.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.sharedState.cacheManager.clearCache()
      // listener bus is async; give it a beat to drain
      Thread.sleep(500)
      val js = rows.toArray(Array.empty[(Int, Double, String)]).sortBy(_._1)
      println(f"JOBS rep=$r query=$name total=$total%.2f n_jobs=${js.length} " +
        f"job_sum=${js.map(_._2).sum}%.2f")
      js.foreach { case (id, s, d) =>
        println(f"  job $id%3d ${s}%6.3f s  ${d.take(90)}") }
    }
    spark.stop()
  }
}
