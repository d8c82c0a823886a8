package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract simulation: the driver smoke-checks
  * `SparkEntry.entry` with its OWN SparkSession — none of graft's
  * session configs present. Run with `sbt "Test/runMain graft.EntryProbe"`.
  * Exercises the dynamic nanosAsLong conf set inside Tables.events. */
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(s)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    println(s"ENTRY_COLS=${df.columns.mkString(",")}")
    assert(n > 0, "entry must return rows")
    s.stop()
  }
}
