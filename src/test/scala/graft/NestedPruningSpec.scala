package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Nested-schema pruning pin (§2 row 124 companion): selecting one
  * leaf of a deeply nested struct must narrow the parquet ReadSchema
  * to that leaf — at 100 TB a wide event envelope (headers, device
  * info, payload variants) where queries touch 2 of 40 leaves reads
  * 5% of the bytes IFF pruning reaches the scan. Columnar formats
  * store each leaf as its own column chunk, so this is pure IO
  * reduction, not decode-time savings.
  */
class NestedPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("nested").toString + "/t"
    // an envelope: meta{device{os,model},geo{lat,lon}}, payload{kind,body}
    Seq((1L, "android", "p9", 1.0, 2.0, "click", "x"),
        (2L, "ios", "15", 3.0, 4.0, "view", "yy"))
      .toDF("id", "os", "model", "lat", "lon", "kind", "body")
      .select($"id",
        struct(struct($"os", $"model").as("device"),
               struct($"lat", $"lon").as("geo")).as("meta"),
        struct($"kind", $"body").as("payload"))
      .write.mode("overwrite").parquet(d)
    d
  }

  private def readSchemaOf(dfPlan: String): String = {
    val i = dfPlan.indexOf("ReadSchema: ")
    assert(i >= 0, s"no ReadSchema in plan:\n$dfPlan")
    dfPlan.substring(i + "ReadSchema: ".length).takeWhile(_ != '\n')
  }

  test("one nested leaf prunes siblings, cousins, and the other root") {
    val df = spark.read.parquet(dir).select($"meta.device.os".as("os"))
    val rs = readSchemaOf(df.queryExecution.executedPlan.toString)
    assert(rs.contains("os"), rs)
    // sibling leaf, cousin struct, and the payload root all pruned
    assert(!rs.contains("model") && !rs.contains("geo") &&
      !rs.contains("payload"), s"unpruned nested read: $rs")
    assert(df.as[String].collect().sorted.toSeq == Seq("android", "ios"))
  }

  test("a filter on one leaf + projection of another reads only those") {
    val df = spark.read.parquet(dir)
      .filter($"payload.kind" === "click")
      .select($"meta.geo.lat".as("lat"))
    val plan = df.queryExecution.executedPlan.toString
    val rs = readSchemaOf(plan)
    assert(rs.contains("lat") && rs.contains("kind"), rs)
    assert(!rs.contains("lon") && !rs.contains("body") &&
      !rs.contains("device"), s"unpruned nested read: $rs")
    // and the nested predicate reaches the parquet pushdown layer
    assert(plan.contains("PushedFilters: [IsNotNull(payload.kind)") ||
      plan.contains("EqualTo(payload.kind,click)"), plan)
    assert(df.as[Double].collect().toSeq == Seq(1.0))
  }

  test("explode of array<struct> keeps only the accessed field") {
    val d2 = java.nio.file.Files.createTempDirectory("nestedarr").toString + "/t"
    Seq((1L, Seq(("a", 1.0, "big0"), ("b", 2.0, "big1"))))
      .toDF("id", "xs")
      .select($"id", transform($"xs",
        x => struct(x.getField("_1").as("k"), x.getField("_2").as("v"),
          x.getField("_3").as("blob"))).as("items"))
      .write.mode("overwrite").parquet(d2)
    val df = spark.read.parquet(d2)
      .select($"id", explode($"items").as("it"))
      .select($"id", $"it.k".as("k"))
    val rs = readSchemaOf(df.queryExecution.executedPlan.toString)
    // the unused v/blob leaves must not be read
    assert(rs.contains("k") && !rs.contains("blob") && !rs.contains("v:"),
      s"generator output not pruned: $rs")
    assert(df.as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (1L, "b")))
  }
}
