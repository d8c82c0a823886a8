package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin
import graft.plans.SpaceSavingTopK
import graft.streaming.EventStream

/** Skew mitigation, heavy-hitters sketch bounds, stream-stream join. */
class SkewStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join is row-identical to the plain join under heavy skew") {
    // 10k rows of the hot key + a uniform tail
    val large = spark.range(10000).select(lit(1L).as("k"), col("id").as("v"))
      .union(spark.range(1000).select((col("id") % 50 + 2).as("k"), col("id").as("v")))
    val small = spark.range(52).select(col("id").as("k"), (col("id") * 100).as("w"))
    val plain = large.join(small, "k")
    val salted = SkewJoin.saltedJoin(large, small, "k", 8)
    assert(salted.count() == plain.count())
    val diff = plain.select("k", "v", "w").exceptAll(salted.select("k", "v", "w"))
    assert(diff.count() == 0)
  }

  test("hot-key salted join: parity, detection, and cold-path passthrough") {
    // Zipf-ish: one celebrity key (10k rows), a warm key (900), a
    // uniform tail over 50 keys, plus keys missing from the dim side
    val large = spark.range(10000).select(lit(1L).as("k"), col("id").as("v"))
      .union(spark.range(900).select(lit(2L).as("k"), (col("id") + 20000).as("v")))
      .union(spark.range(2000).select((col("id") % 50 + 3).as("k"), (col("id") + 50000).as("v")))
    val small = spark.range(40).select(col("id").as("k"), (col("id") * 100).as("w"))

    val hot = SkewJoin.hotKeys(large, "k", minRows = 500L)
    assert(hot.toSet == Set(1L, 2L), "exactly the two celebrity keys detected")

    val plain = large.join(small, "k")
    val salted = SkewJoin.saltedHotJoin(large, small, "k", hot, salt = 8)
    assert(salted.count() == plain.count())
    assert(plain.select("k", "v", "w").exceptAll(salted.select("k", "v", "w")).count() == 0)

    // detect-then-salt convenience = same result
    val auto = SkewJoin.salted(large, small, "k", minRows = 500L, salt = 8)
    assert(plain.select("k", "v", "w").exceptAll(auto.select("k", "v", "w")).count() == 0)

    // no hot keys -> exact plain-join degradation (same result, and
    // the salting machinery never enters the plan)
    val none = SkewJoin.saltedHotJoin(large, small, "k", Seq.empty, 8)
    assert(none.queryExecution.analyzed.toString ==
      large.join(small, Seq("k")).queryExecution.analyzed.toString)
  }

  test("post-salt balance: no salt cell exceeds 2x the fair share") {
    // the pin measures the operator's own salt expression over a
    // 10k-row hot key: fair share 1250/cell at salt=8; hash spread
    // must keep every cell under 2x that
    val hotRows = spark.range(10000).select(lit(1L).as("k"))
    val cells = hotRows.withColumn("__salt", SkewJoin.saltExpr(8))
      .groupBy("__salt").count().as[(Long, Long)].collect()
    assert(cells.length == 8, "all 8 salt cells populated")
    assert(cells.map(_._2).max <= 2500, s"max cell ${cells.map(_._2).max} > 2x fair share")
  }

  test("SpaceSavingTopK finds the heavy hitter even at tiny capacity") {
    val data = (Seq.fill(500)("heavy") ++ (1 to 200).map(i => s"rare$i")).toDF("s")
    val top = data.agg(SpaceSavingTopK.topk_freq(col("s"), 1, 4).as("t"))
      .select(explode(col("t")).as("e")).select("e.item", "e.cnt")
      .as[(String, Long)].collect()
    assert(top.head._1 == "heavy")
    assert(top.head._2 >= 500) // SpaceSaving overestimates, never under
  }

  test("stream-stream interval join matches purchases to preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    val M = 60L * 1000000
    def ev(id: Long, user: Long, tMin: Long, typ: String, v: Double) =
      (id, new java.sql.Timestamp(tMin * 60000), user, typ, v)

    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    def named(ms: MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]) =
      ms.toDS().toDF("event_id", "ts", "user_id", "event_type", "value")

    val joined = EventStream.purchasesAfterClicks(named(clicks), named(purchases))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").start()
    try {
      clicks.addData(ev(1, 7, 100, "click", 0), ev(2, 7, 130, "click", 0))
      purchases.addData(
        ev(10, 7, 105, "purchase", 9.5), // 5 min after click 1 -> match
        ev(11, 7, 125, "purchase", 3.0), // 25 min after click 1 -> no match
        ev(12, 8, 105, "purchase", 1.0)) // wrong user -> no match
      q.processAllAvailable()
      val out = spark.table("ssj_out").select("purchase_id", "click_id")
        .as[(Long, Long)].collect().toSet
      assert(out == Set((10L, 1L)))
    } finally q.stop()
  }
}
