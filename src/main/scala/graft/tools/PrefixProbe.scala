package graft.tools

import graft.functions.TextAnalysis
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off stage-timing probe for [[Dedup.prefixFilterJoin]] (local
  * iteration only; not part of the driver contract). Prints row counts
  * and wall time per stage so optimization targets facts, not guesses.
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tau = 0.6

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = Dedup.shingles(docs, 3).distinct().cache()
    val nSh = timed("shingles distinct")(sh.count())
    println(s"  rows: $nSh")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("_df"))
    val prefix = sh
      .join(dfreq, Seq("shingle"))
      .withColumn("_rnk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("_df"), col("shingle"))))
      .join(sizes, Seq("doc_id"))
      .where(col("_rnk") <= col("sz") - ceil(lit(tau) * col("sz") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("shingle"), col("_rnk"), col("sz"))
      .cache()
    val nPfx = timed("prefix build")(prefix.count())
    println(s"  rows: $nPfx")
    val cands = prefix.select(col("doc_id").as("id_a"), col("shingle"),
        col("_rnk").as("_i"), col("sz").as("sz_a"))
      .join(prefix.select(col("doc_id").as("id_b"), col("shingle"),
        col("_rnk").as("_j"), col("sz").as("sz_b")), Seq("shingle"))
      .where(col("id_a") < col("id_b") &&
        least(col("sz_a"), col("sz_b")).cast("double") >=
          lit(tau) * greatest(col("sz_a"), col("sz_b")).cast("double") - lit(1e-9) &&
        least(col("_i"), col("_j")) +
          least(col("sz_a") - col("_i"), col("sz_b") - col("_j")) >=
          ceil(lit(tau / (1 + tau)) * (col("sz_a") + col("sz_b")) - lit(1e-9)))
      .select("id_a", "id_b").distinct().cache()
    val nCand = timed("candidate pairs (pos-filtered)")(cands.count())
    println(s"  rows: $nCand")
    val out = timed("verify (ngramJaccard)")(
      Dedup.ngramJaccard(docs, cands, precomputedShingles = Some(sh))
        .where(col("jaccard") >= lit(tau)).count())
    println(s"  survivors: $out")
    timed("end-to-end prefixFilterJoin")(
      Dedup.prefixFilterJoin(docs, tau).count())
    spark.stop()
  }
}
