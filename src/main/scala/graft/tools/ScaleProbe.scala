package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** 10x scale probe: replicate sf0.1 inputs in-memory (ids re-keyed to stay
  * unique) and compare runtimes vs 1x — checks the scored plans scale
  * linearly with no cliffs. Experiment tool only; inputs stay synthetic
  * replicas of the driver data.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def rep(name: String, idCols: Seq[String], n: Int): DataFrame = {
      val base = spark.read.parquet(s"$d/$name.parquet")
      (0 until n).map { i =>
        idCols.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(i.toLong * 100000000L)))
      }.reduce(_ unionByName _)
    }
    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"PROBE $label ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    // 6M-row lineitem TPC-H Q1 (10x)
    val li1 = spark.read.parquet(s"$d/lineitem.parquet")
    val li10 = rep("lineitem", Seq("l_orderkey"), 10)
    def q1(li: DataFrame) = li.groupBy("l_returnflag","l_linestatus").agg(
      (sum(round(col("l_quantity")*100).cast("long"))/100.0).as("sum_qty"), count(lit(1)).as("n"))
    time("q1_1x (600k)") { q1(li1) }
    time("q1_10x (6M)") { q1(li10) }
    // minhash on 50k docs (10x)
    val docs10 = rep("documents", Seq("doc_id"), 10)
    time("minhash_1x (5k docs)") { graft.ops.Dedup.minhash(spark.read.parquet(s"$d/documents.parquet")) }
    time("minhash_10x (50k docs)") { graft.ops.Dedup.minhash(docs10) }
    // brute ANN on 20k vectors (10x)
    val emb10 = rep("embeddings", Seq("vec_id"), 10)
    val q = spark.read.parquet(s"$d/embeddings.parquet").limit(1).select(col("embedding").as("qv"))
    time("ann_1x (2k)") { graft.ops.Ann.bruteTopK(spark.read.parquet(s"$d/embeddings.parquet"), q, 10) }
    time("ann_10x (20k)") { graft.ops.Ann.bruteTopK(emb10, q, 10) }
    // as-of join: 100k events x 1.5M orders (10x both sides)
    def prep(ev: DataFrame, ord: DataFrame) = {
      val e = ev.select(col("event_id"), col("user_id"), col("ts"))
      val o = ord.select(col("o_custkey"),
        (unix_micros(col("o_orderdate").cast("timestamp")) * 1000).as("ots"),
        col("o_orderkey"), col("o_totalprice"))
      graft.ops.AsOfJoin.asOf(e, o, "user_id", "o_custkey", "ts", "ots",
        Seq("o_orderkey", "o_totalprice"), tieBreak = "o_orderkey")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev1 = spark.read.parquet(s"$d/events.parquet")
    val or1 = spark.read.parquet(s"$d/orders.parquet")
    time("asof_1x (100k x 150k)") { prep(ev1, or1) }
    time("asof_10x (1M x 1.5M)") { prep(rep("events", Seq("event_id"), 10),
      rep("orders", Seq("o_orderkey"), 10)) }
    // duplicate clustering over LSH candidate pairs (10x docs)
    time("clusters_1x (5k docs)") {
      graft.ops.Dedup.clusters(graft.ops.Dedup.minhashCandidates(
        graft.ops.Dedup.minhash(spark.read.parquet(s"$d/documents.parquet"))))
    }
    time("clusters_10x (50k docs)") {
      graft.ops.Dedup.clusters(graft.ops.Dedup.minhashCandidates(
        graft.ops.Dedup.minhash(docs10)))
    }
    spark.stop()
  }
}
