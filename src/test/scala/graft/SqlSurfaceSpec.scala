package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The SQL face of the engine: temp views over the warehouse +
  * GraftExtensions' registered functions give a SQL-only user the
  * same plans the DataFrame API builds. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("spark.sql over registered views matches the DataFrame path, pushdown intact") {
    Tables.registerViews(spark, TestSpark.sf)
    val sql = spark.sql(
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    val df = graft.operators.Relational.readProject(spark, TestSpark.sf)
    assert(sql.collect().toSeq == df.collect().toSeq)
    // the view is the same lazy scan: predicates still reach parquet
    val plan = sql.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
  }

  test("events view carries the ns->us conversion into SQL") {
    Tables.registerViews(spark, TestSpark.sf)
    val viaSql = spark.sql("SELECT COUNT(*) FROM events WHERE ts IS NOT NULL")
      .collect()(0).getLong(0)
    assert(viaSql == Tables.events(spark, TestSpark.sf).count())
    // timestamps must be TIMESTAMP-typed in SQL, not raw nanos longs
    val t = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType
    assert(t == org.apache.spark.sql.types.TimestampType, t.toString)
  }

  test("registered SQL functions run inside spark.sql") {
    GraftExtensions.register(spark)
    Tables.registerViews(spark, TestSpark.sf)
    val rows = spark.sql(
      "SELECT doc_id, graft_rolling_minhash(text, 8) AS fp FROM documents LIMIT 5")
      .collect()
    assert(rows.length == 5 && rows.forall(!_.isNullAt(1)))
  }

  test("the newer native expressions are SQL-registered too") {
    GraftExtensions.register(spark)
    Tables.registerViews(spark, TestSpark.sf)
    // poly_hash64 == the Column API value
    val viaSql = spark.sql(
      "SELECT graft_poly_hash64('abc') AS h").collect()(0).getLong(0)
    assert(viaSql == graft.plans.PolyHash64.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    // deflate_len positive and below the raw length for compressible text
    val dl = spark.sql(
      "SELECT graft_deflate_len(repeat('spam ', 100)) AS n")
      .collect()(0).getAs[Number](0).longValue()
    assert(dl > 0 && dl < 500, dl.toString)
    // bpe merge inside SQL follows the greedy scan
    val merged = spark.sql(
      "SELECT graft_bpe_merge_pair(array('a','a','a'), 'a', 'a') AS m")
      .collect()(0).getSeq[String](0)
    assert(merged == Seq("aa", "a"), merged.toString)
  }
}
