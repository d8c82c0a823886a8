package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SchemaAlign

/** Schema-file table contracts (round-14 "what's missing" 1): the
  * reference's actual extension mechanism is a JSON file of
  * `{name, type, mode}` entries per table (load.py:65-88 reads
  * schemas/oura/<table>.json); SchemaAlign.fromJsonFile re-expresses
  * it for Spark. The fixture below re-types the reference's
  * oura_day.json SHAPE (BigQuery vocabulary, underscore-flattened
  * names) without copying its content. */
class SchemaContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val contract =
    """[
      |  {"name": "day",                      "type": "DATE",      "mode": "REQUIRED"},
      |  {"name": "activity__id",             "type": "STRING",    "mode": "NULLABLE"},
      |  {"name": "activity__score",          "type": "FLOAT64",   "mode": "NULLABLE"},
      |  {"name": "activity__steps",          "type": "INT64"},
      |  {"name": "activity__timestamp",      "type": "TIMESTAMP", "mode": "NULLABLE"},
      |  {"name": "activity__low_battery",    "type": "BOOLEAN",   "mode": "NULLABLE"},
      |  {"name": "activity__samples",        "type": "FLOAT64",   "mode": "REPEATED"}
      |]""".stripMargin

  test("the reference's file shape parses to the expected StructType") {
    val st = SchemaAlign.fromJsonString(contract)
    assert(st.fields.map(_.name).toSeq == Seq("day", "activity__id",
      "activity__score", "activity__steps", "activity__timestamp",
      "activity__low_battery", "activity__samples"))
    assert(st("day") == StructField("day", DateType, nullable = false))
    assert(st("activity__id").dataType == StringType)
    assert(st("activity__score").dataType == DoubleType)
    // mode omitted -> NULLABLE, the reference's field.get default
    assert(st("activity__steps") == StructField("activity__steps", LongType, nullable = true))
    assert(st("activity__timestamp").dataType == TimestampType)
    assert(st("activity__low_battery").dataType == BooleanType)
    assert(st("activity__samples").dataType ==
      ArrayType(DoubleType, containsNull = true))
  }

  test("align + coerce driven by a file contract: NULL fill, casts, extra-field error") {
    val dir = java.nio.file.Files.createTempDirectory("contract")
    val f = dir.resolve("t.json")
    java.nio.file.Files.writeString(f,
      """[
        |  {"name": "day",    "type": "DATE",    "mode": "REQUIRED"},
        |  {"name": "score",  "type": "FLOAT64", "mode": "NULLABLE"},
        |  {"name": "note",   "type": "STRING",  "mode": "NULLABLE"}
        |]""".stripMargin)
    val target = SchemaAlign.fromJsonFile(f.toString)
    // the frame: day as string (coerced), score as int (cast), no note
    val df = Seq(("2024-03-01", 87), ("2024-03-02", 91)).toDF("day", "score")
    val aligned = SchemaAlign.align(df, target)
    assert(aligned.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("day", DateType), ("score", DoubleType), ("note", StringType)))
    val rows = aligned.orderBy($"day").collect()
    assert(rows.length == 2)
    assert(rows(0).getDate(0).toString == "2024-03-01")
    assert(rows(0).getDouble(1) == 87.0)
    assert(rows.forall(_.isNullAt(2))) // schema-only field NULL-filled
    // a frame column absent from the contract is a hard error
    val boom = df.withColumn("rogue", lit(1))
    intercept[SchemaAlign.ExtraFieldsException] {
      SchemaAlign.align(boom, target)
    }
  }

  test("malformed contracts fail loudly") {
    intercept[IllegalArgumentException] {
      SchemaAlign.fromJsonString("""{"name": "x"}""") // not an array
    }
    intercept[IllegalArgumentException] {
      SchemaAlign.fromJsonString("""[{"type": "STRING"}]""") // no name
    }
    intercept[IllegalArgumentException] {
      SchemaAlign.fromJsonString("""[{"name": "x"}]""") // no type
    }
    intercept[IllegalArgumentException] {
      SchemaAlign.fromJsonString("""[{"name": "x", "type": "GEOGRAPHY"}]""")
    }
    intercept[IllegalArgumentException] {
      SchemaAlign.fromJsonString("""[{"name": "x", "type": "STRING", "mode": "SOMETIMES"}]""")
    }
  }

  test("q_schema_align loads its target from the repo contract file") {
    // the registered query's load path goes through the file; its
    // output must equal the hand-built inline target it replaced
    val got = graft.operators.Etl.schemaAlign(spark, TestSpark.sf)
    assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("event_id", LongType), ("day", StringType),
        ("value", DoubleType), ("quality_flag", StringType)))
    assert(got.count() > 0)
    assert(got.filter($"quality_flag".isNotNull).count() == 0)
  }
}
