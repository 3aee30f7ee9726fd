package graft

import org.apache.spark.sql.functions._

/** Pins the engine's order-independence guarantee: scored aggregates must
  * produce BIT-IDENTICAL doubles under different partitionings (the
  * property that makes the DuckDB hash-compare safe on a cluster).
  */
class DeterminismSpec extends SparkSpec {

  val sensitive = Seq("q_agg_group", "q_join_inner", "q_window_frame",
    "q_ann_topk", "q_quality", "q_sessionize",
    // round-5 float-bearing additions: double medians/deviations, the
    // two-stage sliding sum, and the sharded PPS selection
    "q_mad", "q_quantiles", "q_window_sliding", "q_sample_weighted")

  test("aggregates are bit-identical across shuffle partitionings") {
    val d = "/root/testdata/sf0.001"
    sensitive.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val a = canon(fn(spark, d))
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = canon(fn(spark, d))
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b, s"$name differs across partitionings")
    }
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "null"
        else r.get(i) match {
          case d: Double => java.lang.Double.doubleToLongBits(d).toString
          case v => v.toString
        }).toSeq)
      .sortBy(_.mkString("|")).toSeq
  }
}
