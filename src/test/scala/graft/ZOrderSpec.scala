package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder
import graft.sources.Tables

/** Z-order clustering: both columns must get usable per-file ranges. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Mean fraction of each column's global range covered per file —
    * lower = better pruning on a filter over that column. */
  private def meanRangeFraction(path: String, c: String): Double = {
    val withFile = spark.read.parquet(path)
      .select(col(c), input_file_name().as("f"))
    val global = withFile.agg(max(col(c)) - min(col(c))).head().getLong(0).toDouble
    val per = withFile.groupBy($"f")
      .agg((max(col(c)) - min(col(c))).as("w"))
      .agg(avg($"w")).head().getDouble(0)
    per / global
  }

  test("null cluster-column values rank to bucket 0, not the max bucket") {
    val df = Seq((1L, Option(5L)), (1L, None), (1L, Option(100L)))
      .toDF("a", "b")
    val z = ZOrder.withZValue(df, "a", "b").select($"b", $"__z")
      .as[(Option[Long], Long)].collect().toMap
    // null b must share the z-value of the MIN b (rank 0), not the max
    assert(z(None) == z(Some(5L)), s"null ranked to ${z(None)}, min to ${z(Some(5L))}")
    assert(z(None) != z(Some(100L)))
  }

  test("quantile ranks survive value skew where uniform buckets collapse") {
    // colB is heavy-tailed: 90% of rows in [0, 4096), 10% outliers near
    // 1e12. Uniform [min,max] buckets put the whole dense mass in
    // bucket 0 and all outliers in the top bucket (the tail dominates
    // the width); quantile boundaries equalize row count per bucket.
    val df = spark.range(4096).select(
      $"id".as("a"),
      when($"id" % 10 < 9, $"id").otherwise(lit(1000000000000L) + $"id").as("b"))
    val uniform = ZOrder.withZValue(df, "a", "b")
    val quantile = ZOrder.withZValueQuantile(df, "a", "b")
    // count distinct b-rank values (even bits of z encode b's rank)
    def bRanks(z: org.apache.spark.sql.DataFrame): Long = {
      val evenBits = (0 until ZOrder.Bits).map(i =>
        shiftright($"__z", 2 * i).bitwiseAND(1) * (1L << i)).reduce(_ + _)
      z.select(evenBits.as("rb")).distinct().count()
    }
    val u = bRanks(uniform)
    val q = bRanks(quantile)
    assert(u <= 4, s"uniform buckets should collapse under this tail, got $u ranks")
    assert(q >= 64, s"expected >= 64 distinct quantile ranks, got $q")
  }

  test("z-ordered files bound BOTH columns; single-sort bounds only one") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select($"l_partkey", $"l_suppkey", $"l_orderkey", $"l_quantity")
    val zdir = Files.createTempDirectory("graft_z").toString + "/z"
    val sdir = Files.createTempDirectory("graft_z").toString + "/s"
    ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey", zdir, numFiles = 16)
    li.repartitionByRange(16, $"l_partkey").sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(sdir)

    assert(spark.read.parquet(zdir).count() == li.count())

    val zA = meanRangeFraction(zdir, "l_partkey")
    val zB = meanRangeFraction(zdir, "l_suppkey")
    val sB = meanRangeFraction(sdir, "l_suppkey")
    // z-order: both columns materially bounded per file
    assert(zA < 0.5 && zB < 0.5, s"zA=$zA zB=$zB")
    // the single-column sort leaves the second column unbounded (~full range)
    assert(zB < sB * 0.75, s"zB=$zB vs single-sort sB=$sB")
  }

  /** Reference xy2d (Hamilton's iterative form) for cross-checking the
    * Column fold. */
  private def refHilbert(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        val (nx, ny) = if (rx == 1) (s - 1 - y, s - 1 - x) else (y, x)
        x = nx; y = ny
      }
      s >>= 1
    }
    d
  }

  test("hilbert: order-1 quadrant order and equality with the reference impl") {
    val pts = for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("h", ZOrder.hilbertIndex(col("x"), col("y"), bits = 4))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refHilbert(4, x, y), s"mismatch at ($x,$y)")
    }
    // the classic order-1 U at bits=1: (0,0)=0 (0,1)=1 (1,1)=2 (1,0)=3
    val u = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .withColumn("h", ZOrder.hilbertIndex(col("x"), col("y"), bits = 1))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(u == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (1L, 1L) -> 2L, (1L, 0L) -> 3L))
  }

  test("hilbert: a bijection onto 0..n^2-1 whose consecutive cells are adjacent") {
    val pts = for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("h", ZOrder.hilbertIndex(col("x"), col("y"), bits = 4))
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._3).toSet == (0L until 256L).toSet) // bijection
    val byD = got.map(r => r._3 -> ((r._1, r._2))).toMap
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"Hilbert jumped between d=$d and ${d + 1}") // Morton would fail this
    }
  }
}
