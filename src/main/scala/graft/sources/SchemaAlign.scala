package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Target-schema alignment before a warehouse write.
  *
  * Reference behavior (load.py:104-181): fields present in the target
  * schema but missing from the frame are added as NULL columns; fields
  * present in the frame but absent from the schema are a hard error;
  * column types are coerced to the schema's types (load.py/transform.py
  * timestamp coercion, transform.py:96-111).
  *
  * Implemented as a single `select` of cast/null expressions — one
  * Catalyst projection, no data movement beyond the write itself.
  */
object SchemaAlign {

  final case class ExtraFieldsException(extra: Seq[String])
    extends IllegalArgumentException(
      s"Fields present in the frame but missing from the target schema: ${extra.mkString(", ")}")

  /** Align `df` to `target`: missing→NULL, extra→error (or drop), cast. */
  def align(df: DataFrame, target: StructType, failOnExtra: Boolean = true): DataFrame = {
    val have = df.schema.fieldNames.toSet
    val want = target.fieldNames.toSet
    val extra = df.schema.fieldNames.filterNot(want.contains).toSeq
    if (extra.nonEmpty && failOnExtra) throw ExtraFieldsException(extra)
    val cols: Seq[Column] = target.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }

  /** Coerce only the named columns to a type (the reference's
    * schema-driven TIMESTAMP pass, transform.py:96-111). */
  def coerce(df: DataFrame, types: Map[String, DataType]): DataFrame =
    types.foldLeft(df) { case (acc, (name, dt)) =>
      if (acc.columns.contains(name)) acc.withColumn(name, col(name).cast(dt)) else acc
    }
}
