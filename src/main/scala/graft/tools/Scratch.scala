package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    if (args.headOption.contains("stages")) { pipelineStages(spark, sfDir); spark.stop(); return }
    val names = if (args.isEmpty) Seq("q_dedup_pipeline") else args.toSeq
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      // warm
      fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"$n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }

  /** Time each stage of the near-dedup pipeline separately. */
  def pipelineStages(spark: SparkSession, sfDir: String): Unit = {
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val sig = graft.ops.Dedup.minhash(docs)
      time("minhash+collect") { sig.write.mode("overwrite").format("noop").save() }
      val pairs = graft.ops.Dedup.minhashCandidates(sig).cache()
      time("candidates(materialize)") { pairs.count() }
      val verified = graft.ops.Dedup.ngramJaccard(docs, pairs)
        .where(col("jaccard") >= 0.6).select("id_a", "id_b")
      val vCached = verified.cache()
      time("verify(materialize)") { vCached.count() }
      println(s"verified edges: ${vCached.count()}  distinct nodes: ${vCached
        .select(col("id_a").as("n")).union(vCached.select(col("id_b").as("n")))
        .distinct().count()}")
      val labels = time("clusters") { graft.ops.Dedup.clusters(vCached) }
      time("keepBest") {
        graft.ops.Dedup.keepBest(docs, labels, col("n_chars"))
          .write.mode("overwrite").format("noop").save()
      }
      time("full nearDedup") {
        graft.ops.Dedup.nearDedup(docs, score = col("n_chars"))
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
  }
}
