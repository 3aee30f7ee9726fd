package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries and
  * greps it for the scale properties we require — filter/column pushdown to
  * the parquet scan, broadcast joins on dimension sides, whole-stage
  * codegen coverage.
  *
  * Run: `sbt "runMain graft.tools.Explain [sfDir] [query ...]"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q_filter", "q_join_inner", "q_agg_group", "q_topk",
                         "q_ann_topk", "q_dedup_minhash", "q_window_rownum",
                         "q_join_asof", "q_ann_lsh", "q_skew_distinct", "q_pack",
                         "q_dedup_semantic", "q_dedup_spans", "q_chunk",
                         "q_heavy_hitters", "q_tpch_q5")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val plan = qs(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n########## $n")
      println(plan)
      val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
      val props = Seq(
        "pushedFilters" -> pushed,
        "broadcastJoin" -> plan.contains("BroadcastHashJoin"),
        "sortMergeJoin" -> plan.contains("SortMergeJoin"),
        "takeOrdered" -> plan.contains("TakeOrderedAndProject"),
        "CollectLimit(driver-side!)" -> plan.contains("CollectLimit"))
      println("PROPS " + n + " :: " + props.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
