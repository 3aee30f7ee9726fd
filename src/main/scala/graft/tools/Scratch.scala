package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway local profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.isEmpty) Seq("q_dedup_clusters", "q_dedup_simhash", "q_dedup_simhash_pairs") else args.toSeq
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      // warm
      fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"$n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
