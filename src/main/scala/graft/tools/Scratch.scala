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
    if (args.headOption.contains("floor")) { floor(spark, sfDir); spark.stop(); return }
    if (args.headOption.contains("aqe")) { aqeAblate(spark, sfDir, args.drop(1)); spark.stop(); return }
    if (args.headOption.contains("prof")) { profileStages(spark, sfDir, args.drop(1)); spark.stop(); return }
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

  /** Per-stage wall/task profile of a query run: registers a stage
    * listener, runs the query through the noop sink (second run, after a
    * warm run at the same SF so codegen/JIT are paid), and prints each
    * stage's wall span, task count, summed task time, max task time, and
    * shuffle bytes — the local stand-in for the Spark UI's stage table.
    */
  def profileStages(spark: SparkSession, sfDir: String, queries: Seq[String]): Unit = {
    import org.apache.spark.scheduler._
    import scala.collection.mutable
    case class St(name: String, var submitted: Long = 0L, var completed: Long = 0L,
                  var tasks: Int = 0, var taskTime: Long = 0L, var maxTask: Long = 0L,
                  var shufRead: Long = 0L, var shufWrite: Long = 0L, var input: Long = 0L)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    var collect = false
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (collect) stages.getOrElseUpdate(e.stageInfo.stageId,
          St(e.stageInfo.name)).submitted = System.nanoTime()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collect) stages.get(e.stageInfo.stageId).foreach { s =>
          s.completed = System.nanoTime()
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (collect) stages.get(e.stageId).foreach { s =>
          s.tasks += 1
          val rt = e.taskInfo.duration
          s.taskTime += rt
          s.maxTask = math.max(s.maxTask, rt)
          Option(e.taskMetrics).foreach { m =>
            s.shufRead += m.shuffleReadMetrics.totalBytesRead
            s.shufWrite += m.shuffleWriteMetrics.bytesWritten
            s.input += m.inputMetrics.bytesRead
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val names = if (queries.isEmpty) Seq("q_dedup_spans") else queries
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // one untimed full-SF pass so JIT/codegen for this exact shape is hot
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      stages.clear(); collect = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      collect = false
      Thread.sleep(300) // let the listener bus drain
      println(f"\n== $n total=$wall%.3f s, ${stages.size} stages")
      val t0n = stages.values.map(_.submitted).filter(_ > 0).minOption.getOrElse(0L)
      stages.toSeq.sortBy(_._2.submitted).foreach { case (id, s) =>
        val span = (s.completed - s.submitted) / 1e9
        val off = (s.submitted - t0n) / 1e9
        println(f"  stage $id%-4d +$off%6.3f span=$span%6.3f tasks=${s.tasks}%-3d " +
          f"taskSum=${s.taskTime / 1e3}%7.3f max=${s.maxTask / 1e3}%6.3f " +
          f"in=${s.input / 1024}%8dK sr=${s.shufRead / 1024}%6dK sw=${s.shufWrite / 1024}%6dK  ${s.name.take(60)}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.sparkContext.removeSparkListener(listener)
  }

  /** Ablate AQE sub-features one at a time over the given queries to
    * find WHICH runtime-adaptation path costs the wall difference the
    * on/off A-B shows (the flag is read at execution time, so setting
    * session conf between runs is enough).
    */
  def aqeAblate(spark: SparkSession, sfDir: String, queries: Seq[String]): Unit = {
    val names = if (queries.isEmpty) Seq("q_dedup_prefix") else queries
    val variants: Seq[(String, Map[String, String])] = Seq(
      "aqe=on" -> Map("spark.sql.adaptive.enabled" -> "true"),
      "aqe=off" -> Map("spark.sql.adaptive.enabled" -> "false"),
      "on,noCoalesce" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false"),
      "on,noRuntimeBhj" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"),
      "on,noLocalReader" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.localShuffleReader.enabled" -> "false"),
      "on,noSkewJoin" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "false"),
      "on,cacheUncompressed" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.inMemoryColumnarStorage.compressed" -> "false"),
      "on,cacheBatch100k" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.inMemoryColumnarStorage.batchSize" -> "100000"),
      "on,minPart32" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionNum" -> "32"),
      "on,minPart8" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionNum" -> "8"))
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      for ((label, conf) <- variants) {
        conf.foreach { case (k, v) => spark.conf.set(k, v) }
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$n%-20s $label%-18s min=${runs.min}%.2f  runs=${runs.map(r => f"$r%.2f").mkString(",")}")
        conf.keys.foreach(spark.conf.unset)
      }
    }
  }

  /** Decompose the per-query bench floor: scheduling, single-row-group
    * scan serialization, shuffle, and the effect of a parallelizing
    * repartition after the scan.
    */
  def floor(spark: SparkSession, sfDir: String): Unit = {
    def time(label: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: min=${runs.min}%.3f s  runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("noop(range1)") {
      spark.range(1).write.mode("overwrite").format("noop").save()
    }
    time("scan count(lineitem)") { li.agg(count(lit(1))).collect() }
    time("scan all cols noop") { li.write.mode("overwrite").format("noop").save() }
    def aggShape(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("sq"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sb"),
        count(lit(1)).as("n"))
    time("agg_group (1-task scan)") {
      aggShape(li).write.mode("overwrite").format("noop").save()
    }
    time("agg_group (repartition 32)") {
      aggShape(li.repartition(32)).write.mode("overwrite").format("noop").save()
    }
    time("minhash sig (1-task scan)") {
      graft.ops.Dedup.minhash(docs).write.mode("overwrite").format("noop").save()
    }
    time("minhash sig (repartition 32)") {
      graft.ops.Dedup.minhash(docs.repartition(32))
        .write.mode("overwrite").format("noop").save()
    }
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
