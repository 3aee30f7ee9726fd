package graft.tools

import graft.functions.TextAnalysis
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage-timing probe for [[Dedup.prefixFilterJoin]] (local
  * iteration only; not part of the driver contract). Mirrors the
  * CURRENT implementation's stages — collapsed duplicate-set groups,
  * df table, ranked prefix, positional-filtered candidates — printing
  * row counts and wall time per stage so optimization targets facts,
  * not guesses.
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tau = 0.6
    val shingleSize = 3

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // stage 1: collapsed duplicate-set groups (mirror of
    // Dedup.collapsedShingleGroups)
    val groups = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
      .where(size(col("_toks")) >= shingleSize)
      .select(col("doc_id"), sort_array(array_distinct(transform(
        sequence(lit(0), size(col("_toks")) - shingleSize),
        i => concat_ws(" ",
          (0 until shingleSize).map(j => element_at(col("_toks"), i + j + 1)): _*)
      ))).as("_set"))
      .withColumn("sz", size(col("_set")))
      .withColumn("_gk", md5(concat_ws("\u0001", col("_set"))))
      .groupBy(col("_gk"))
      .agg(min(col("doc_id")).as("_rep"),
        collect_list(col("doc_id")).as("_members"),
        first(col("_set")).as("_set"), first(col("sz")).as("sz"),
        count(lit(1)).as("_n"))
      .cache()
    val nG = timed("groups (collapsed sets)")(groups.count())
    println(s"  rows: $nG")

    val reps = groups.select(col("_rep").as("doc_id"), col("_set"), col("sz"))
    val exploded = reps.select(col("doc_id"), col("sz"),
      explode(col("_set")).as("shingle"))
    val dfreq = exploded.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
    val nDf = timed("df table")(dfreq.count())
    println(s"  rows: $nDf")

    val prefixLen = (col("sz") -
      ceil(lit(tau) * col("sz") - lit(1e-9)) + 1).cast("int")
    val prefix = exploded
      .join(dfreq, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("_df"), col("shingle")))).as("_ranked"),
        first(col("sz")).as("sz"))
      .select(col("doc_id"), col("sz"),
        posexplode(slice(col("_ranked.shingle"), lit(1), prefixLen)))
      .select(col("doc_id"), (col("pos") + 1).as("_rnk"),
        col("col").as("shingle"), col("sz"))
      .cache()
    val nPfx = timed("ranked prefix")(prefix.count())
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

    val verified = cands
      .join(reps.select(col("doc_id").as("id_a"), col("_set").as("_sa"),
        col("sz").as("sz_a")), Seq("id_a"))
      .join(reps.select(col("doc_id").as("id_b"), col("_set").as("_sb"),
        col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("inter",
        graft.functions.SortedIntersectCount(col("_sa"), col("_sb")))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= lit(tau))
    val nV = timed("verify (merge-loop intersect)")(verified.count())
    println(s"  survivors: $nV")

    spark.catalog.clearCache()
    timed("end-to-end prefixFilterJoin")(
      Dedup.prefixFilterJoin(docs, tau).write.mode("overwrite")
        .format("noop").save())
    spark.catalog.clearCache()
    timed("end-to-end (2nd, warm JIT)")(
      Dedup.prefixFilterJoin(docs, tau).write.mode("overwrite")
        .format("noop").save())
    spark.stop()
  }
}
