package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Missing-day detection over a daily series.
  *
  * The reference's watermark logic assumes a dense daily series per data
  * type (extract.py:170-177 starts at max+1); this operator surfaces the
  * holes. Spark-first: a per-group `sequence()` date spine exploded and
  * anti-joined against observed days — the spine is generated where the
  * group lives (no driver loop), and the anti join shuffles on
  * (group, day) once.
  */
object GapFill {

  /** Days absent between each group's min and max day.
    * `df` must contain `dayCol`; `groupCols` may be empty for a global
    * series. */
  def missingDays(df: DataFrame, groupCols: Seq[String], dayCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    val bounds = df.groupBy(gcols: _*)
      .agg(min(col(dayCol)).as("__d0"), max(col(dayCol)).as("__d1"))
    val spine = bounds
      .select(gcols :+ explode(sequence(col("__d0"), col("__d1"))).as(dayCol): _*)
    val have = df.select(gcols :+ col(dayCol): _*).distinct()
    spine.join(have, groupCols :+ dayCol, "left_anti")
  }
}
