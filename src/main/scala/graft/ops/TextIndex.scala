package graft.ops

import graft.functions.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — the text-retrieval analog of
  * [[Ann.buildIvfIndex]]'s partition-pruned layout.
  *
  * The reference delegates all text search to its target databases
  * (Elasticsearch gets the raw documents and indexes them itself,
  * `/root/reference/lib/elasticsearch.js:45-60`); the SQL targets offer
  * only `LIKE`. Here the index is a first-class Spark-native structure:
  * posting lists `(term, doc_id, tf)` written `partitionBy` a stable
  * term-hash bucket, so a conjunctive query touches only its terms'
  * buckets **at file-listing time** — the same pruning contract as the
  * IVF index's `centroid_id` partitions ([[Ann.searchIvfIndex]]).
  *
  * 100-TB shape: the index build is one explode + one shuffle on
  * `(term, doc_id)`; a query reads `O(terms)` partitions out of
  * `nBuckets` regardless of corpus size, and the per-bucket postings
  * aggregate map-side before the tiny `doc_id` shuffle. No scan of the
  * corpus text ever happens at query time.
  */
object TextIndex {

  /** Build posting lists under `dir`: one row per distinct `(term, doc)`
    * with its term frequency, partitioned by [[TextAnalysis.featureBucket]]
    * of the term (md5 24-bit prefix mod `nBuckets` — engine-exact, so the
    * oracle can mirror the postings if it ever needs to). Terms are the
    * engine-wide whitespace tokens ([[TextAnalysis.tokens]]).
    */
  def build(docs: DataFrame, dir: String, nBuckets: Int = 64,
            idCol: String = "doc_id", textCol: String = "text"): Unit =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", TextAnalysis.featureBucket(col("term"), nBuckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  /** Driver-side mirror of [[TextAnalysis.featureBucket]] for computing a
    * query term's partition without touching the cluster.
    */
  def bucketOf(term: String, nBuckets: Int): Long = {
    require(nBuckets > 0 && nBuckets <= (1 << 24),
      s"nBuckets must be in 1..2^24, got $nBuckets")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes("UTF-8"))
      .take(3).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % nBuckets
  }

  /** Conjunctive (AND) search over a [[build]] index: the query terms'
    * buckets are computed driver-side (per-query scalar work), the scan
    * prunes to those partitions at listing time, matching postings
    * aggregate per doc, and only docs carrying EVERY query term survive.
    * Score = total term frequency across the query terms.
    *
    * Returns `[doc_id, score]`. `nBuckets` must match the build.
    */
  def search(spark: SparkSession, dir: String, terms: Seq[String],
             nBuckets: Int = 64): DataFrame = {
    require(terms.nonEmpty, "search requires at least one term")
    val distinctTerms = terms.distinct
    val buckets = distinctTerms.map(bucketOf(_, nBuckets)).distinct
    spark.read.parquet(dir)
      .where(col("bucket").isin(buckets.map(java.lang.Long.valueOf): _*))
      .where(col("term").isin(distinctTerms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("score"))
      .where(col("n_terms") === distinctTerms.size)
      .select(col("doc_id"), col("score"))
  }
}
