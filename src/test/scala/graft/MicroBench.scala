package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro-bench: run the named queries `reps` times each in one
  * JVM (same session config as Bench) and print every rep plus the min
  * — the within-run variance at sf0.1 swamps sub-second effects, so
  * optimization A/Bs need repeated in-process timings, not one-shot
  * subset runs. Not part of the driver surface.
  *
  * Usage: Test/runMain graft.MicroBench <sfDir> <reps> q_a,q_b,... */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, repsS, names) = args
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
    // same startup warmups as Bench so rep 1 is not pure cold start
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown $name"))
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir) // construction (incl. any eager jobs)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        spark.sharedState.cacheManager.clearCache()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val mins = (ts.map(_._1).min, ts.map(_._2).min)
      println(f"MICRO $name%-28s min_total=${ts.map(t => t._1 + t._2).min}%.2f " +
        f"min_build=${mins._1}%.2f min_count=${mins._2}%.2f reps=" +
        ts.map(t => f"${t._1 + t._2}%.2f").mkString(","))
    }
    spark.stop()
  }
}
