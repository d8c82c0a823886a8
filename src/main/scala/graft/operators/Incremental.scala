package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (watermark) extraction logic.
  *
  * Reference behavior: the next extraction window starts after the max
  * already-landed date (extract.py:170-177); the landed-date inventory
  * is `SELECT DISTINCT day` against the warehouse (load.py:209-224);
  * long spans are split into fixed-size chunks (extract.py:133-149).
  *
  * The watermark is joined in as a broadcast scalar — no `collect()`,
  * so the same plan runs unchanged when `existing` is 100 TB.
  */
object Incremental {

  /** Rows of `incoming` strictly newer than max(existing[keyCol]).
    * `default` plays the reference's HISTORICAL_DAYS backfill start when
    * `existing` is empty (constants.py:17). */
  def newerThanWatermark(incoming: DataFrame, existing: DataFrame,
                         keyCol: String, default: Option[Column] = None): DataFrame = {
    val wmExpr = default match {
      case Some(dflt) => coalesce(max(col(keyCol)), dflt)
      case None => max(col(keyCol))
    }
    val wm = existing.agg(wmExpr.as("__graft_wm"))
    incoming.crossJoin(broadcast(wm))
      .filter(col(keyCol) > col("__graft_wm"))
      .drop("__graft_wm")
  }

  /** Distinct landed days with record counts (load.py:209-224,325-348). */
  def existingDates(df: DataFrame, dayCol: Column): DataFrame =
    df.groupBy(dayCol.as("day")).agg(count(lit(1)).as("n_records"))

  /** Assign each row to a fixed-width chunk of days from `anchor`
    * (extract.py:133-149 — the 7-day heartrate chunking). */
  def withChunk(df: DataFrame, dayCol: Column, anchor: Column, chunkDays: Int): DataFrame =
    df.withColumn("chunk",
      floor(datediff(dayCol, anchor) / lit(chunkDays.toDouble)).cast("long"))
}
