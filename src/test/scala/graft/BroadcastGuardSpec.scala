package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BroadcastHintGuard
import graft.sources.Tables

/** BroadcastHintGuard (SURVEY.md §2 row 307): a forced broadcast of a
  * statistically-oversized side is stripped (AQE then decides from
  * runtime sizes); fixed-cardinality dims keep their hints; the conf
  * switch disables it. Installed/uninstalled around each case — the
  * shared session's other specs pin hinted plans of their own. */
class BroadcastGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withGuard[T](confs: (String, String)*)(body: => T): T = {
    BroadcastHintGuard.install(spark)
    try TestSpark.withConf(confs: _*)(body)
    finally BroadcastHintGuard.uninstall(spark)
  }

  private def joinHintOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.hint.toString
    }.mkString(";")

  test("an oversized forced broadcast is stripped; the query still answers correctly") {
    // cap = 1 KB x 1: the lineitem scan's estimate is far above it
    withGuard("spark.sql.autoBroadcastJoinThreshold" -> "1024",
              "spark.graft.broadcastGuard.factor" -> "1") {
      val li = Tables.lineitem(spark, TestSpark.sf)
      val ord = Tables.orders(spark, TestSpark.sf)
      val q = ord.join(broadcast(li), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(!joinHintOf(q).contains("broadcast"), joinHintOf(q))
      // and the plan is executable + correct without the hint
      val n = q.agg(sum(col("n"))).head().getLong(0)
      assert(n == Tables.lineitem(spark, TestSpark.sf).count())
    }
  }

  test("a fixed-cardinality dim keeps its hint") {
    withGuard() {
      val q = Tables.customer(spark, TestSpark.sf)
        .join(broadcast(Tables.nation(spark, TestSpark.sf)),
          col("n_nationkey") === col("c_nationkey"))
      assert(joinHintOf(q).contains("broadcast"), joinHintOf(q))
    }
  }

  test("the conf switch disables the guard") {
    withGuard("spark.sql.autoBroadcastJoinThreshold" -> "1024",
              "spark.graft.broadcastGuard.factor" -> "1",
              "spark.graft.broadcastGuard.enabled" -> "false") {
      val q = Tables.orders(spark, TestSpark.sf)
        .join(broadcast(Tables.lineitem(spark, TestSpark.sf)),
          col("l_orderkey") === col("o_orderkey"))
      assert(joinHintOf(q).contains("broadcast"), joinHintOf(q))
    }
  }

  test("without the guard installed nothing changes (spec hygiene)") {
    val q = Tables.orders(spark, TestSpark.sf)
      .join(broadcast(Tables.lineitem(spark, TestSpark.sf)),
        col("l_orderkey") === col("o_orderkey"))
    assert(joinHintOf(q).contains("broadcast"), joinHintOf(q))
  }
}
