package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Recursive schema flattening.
  *
  * Reference behavior (transform.py:38-52): nested dicts are flattened
  * into `parent__child` column paths; arrays are serialized to JSON
  * strings. Here the same contract is expressed over Spark's typed
  * schema: struct fields recurse, array/map fields become `to_json`
  * strings — all as pure column expressions, so the flatten is part of
  * the Catalyst plan (codegen'd, pushdown-transparent), not a row-level
  * UDF pass like the reference's per-record Python loop.
  */
object Flatten {

  val DefaultSep = "__"

  private def expand(c: Column, dt: DataType, name: String, sep: String): Seq[(String, Column)] =
    dt match {
      case st: StructType =>
        st.fields.toSeq.flatMap(f =>
          expand(c.getField(f.name), f.dataType, s"$name$sep${f.name}", sep))
      case _: ArrayType | _: MapType => Seq(name -> to_json(c))
      case _ => Seq(name -> c)
    }

  /** Flatten all nested struct columns; arrays/maps become JSON strings. */
  def flatten(df: DataFrame, sep: String = DefaultSep): DataFrame = {
    val cols = df.schema.fields.toSeq.flatMap(f =>
      expand(col(f.name), f.dataType, f.name, sep))
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** Parse + validate a string date column into `day` (transform.py:17-22):
    * unparseable values become null; `requireValid` drops them (the
    * reference skips such records with a warning). */
  def withDay(df: DataFrame, dateCol: String, format: String = "yyyy-MM-dd",
              requireValid: Boolean = true): DataFrame = {
    // try_to_date: ANSI mode (Spark 4 default) makes to_date throw on
    // unparseable input; the reference skips such records instead.
    val parsed = df.withColumn("day",
      expr(s"try_to_date(`$dateCol`, '$format')"))
    if (requireValid) parsed.filter(col("day").isNotNull) else parsed
  }
}
