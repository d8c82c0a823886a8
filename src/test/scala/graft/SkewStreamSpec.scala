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
