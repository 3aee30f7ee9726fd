package graft.ops

import graft.functions.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale shapes:
  *   - [[bruteTopK]]: one scan, cosine per row (codegen'd array kernel, no
  *     shuffle), then `TakeOrderedAndProject` — the exact baseline. At
  *     100 TB this is a full scan but embarrassingly parallel; per-partition
  *     top-k keeps only k rows per task in memory.
  *   - [[assign]] / [[ivfTopK]]: IVF — vectors are pre-assigned to their
  *     nearest centroid (one broadcast join against the small centroid set,
  *     no shuffle of the big side beyond the write partitioning); a query
  *     then scans only its centroid's bucket (`nprobe`=1 here), cutting the
  *     scan by the centroid fan-out. Centroid training is out of scope —
  *     any fixed centroid set works (here: a deterministic sample).
  *   - Sign-LSH bucketing ([[Similarity.signBucket]]) is the third path:
  *     bucket co-membership as a candidate filter for near-dup joins.
  */
object Ann {

  /** Exact brute-force top-k by cosine against one query vector (given as a
    * 1-row DataFrame `[qv: array<float>]`). Exact-decimal kernel so results
    * are engine-reproducible.
    */
  def bruteTopK(vectors: DataFrame, query: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    vectors
      .crossJoin(broadcast(query))
      .select(col(idCol),
        graft.functions.CosineSimilarity(col(vecCol), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** Assign every vector to its nearest centroid (argmax cosine; ties →
    * lowest centroid id). Centroids are broadcast; the big side never
    * shuffles.
    */
  def assign(vectors: DataFrame, centroids: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cos").desc, col("centroid_id"))
    vectors
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col("centroid_id"),
        graft.functions.CosineSimilarity(col(vecCol), col("cv")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(idCol), col("centroid_id"), col("cos"))
  }

  /** IVF search with nprobe=1: top-k within the query's own centroid
    * bucket. `assigned` is the output of [[assign]] joined back to the
    * vectors (i.e. carries id, centroid_id, embedding).
    */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame, query: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qCentroid = assignQuery(query, centroids)
    assigned
      .join(broadcast(qCentroid), Seq("centroid_id"))
      .select(col(idCol), graft.functions.CosineSimilarity(col(vecCol), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** The query vector's nearest centroid: `[centroid_id, qv]` (1 row). */
  private def assignQuery(query: DataFrame, centroids: DataFrame): DataFrame =
    query
      .crossJoin(broadcast(centroids))
      .select(col("centroid_id"), col("qv"),
        graft.functions.CosineSimilarity(col("qv"), col("cv")).as("cos"))
      .orderBy(col("cos").desc, col("centroid_id"))
      .limit(1)
      .select(col("centroid_id"), col("qv"))
}
