package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: dumps `.explain("formatted")` for the headline
  * queries so pushdown/broadcast/codegen can be inspected and regressions
  * caught by eye (SURVEY §4: PushedFilters, ReadSchema pruning,
  * BroadcastHashJoin for the dictionary, WholeStageCodegen spans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_agg_sum", "q02_join_agg", "q11_interval_overlap",
        "linkage_annotate", "ann_topk", "dedup_minhash")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"\n===================== $n =====================")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
