package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate / overlap detection with provenance.
  *
  * Reference behavior: loading errors out when two raw blobs contribute
  * the same day, reporting both sources (load.py:277-302); the landing
  * zone validator errors when two landed date *ranges* intersect
  * (common_utils.py:60-75).
  */
object Overlap {

  /** Key groups occurring more than once, with min/max of `idCol` as
    * provenance (the reference reports both conflicting records). */
  def duplicates(df: DataFrame, keys: Seq[Column], idCol: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_dup"),
           min(idCol).as("first_id"), max(idCol).as("last_id"))
      .filter(col("n_dup") > 1)

  /** Overlapping [startCol, endCol] interval pairs within each `partition`
    * group, across distinct `labelCol` values. Equi-join on the partition
    * key + range predicate: the join shuffles on the partition key only,
    * so at scale each group is compared locally (no cartesian across
    * groups). */
  def rangeOverlaps(ranges: DataFrame, partition: String, labelCol: String,
                    startCol: String, endCol: String): DataFrame = {
    val a = ranges.select(col(partition), col(labelCol).as("label_a"),
      col(startCol).as("a_start"), col(endCol).as("a_end"))
    val b = ranges.select(col(partition).as("__p"), col(labelCol).as("label_b"),
      col(startCol).as("b_start"), col(endCol).as("b_end"))
    a.join(b,
        col(partition) === col("__p") &&
        col("label_a") < col("label_b") &&
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .drop("__p")
  }
}
