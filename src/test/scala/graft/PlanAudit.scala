package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc: print formatted physical plans for the round-5 queries
  * (run manually; not a test). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_split_assign", "q_decontaminate", "q_pack_sequences",
      "q_repetition_filter", "q_token_budget_sample", "q_cross_dedup",
      "q_label_centroids", "q_heavy_hitters", "q_extract_plan")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      println(SparkEntry.queries(n)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
  }
}
