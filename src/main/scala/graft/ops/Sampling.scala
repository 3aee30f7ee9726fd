package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for dataset curation.
  *
  * Everything keys off the md5 of a stable row key — never `rand()` — so a
  * sample or train/val/test assignment is reproducible across runs,
  * engines, partitionings, and cluster sizes, and a row's assignment never
  * changes as the corpus grows (the property a training pipeline needs for
  * stable eval splits). md5's hex digits are uniform, so a hex-prefix
  * range is an unbiased Bernoulli sample with a deterministic membership
  * function.
  *
  * Both helpers are pure map-side expression trees: no shuffle, no state,
  * trivially pushdown-friendly.
  */
object Sampling {

  /** First two md5 hex digits of the key as the 256-bucket hash. */
  private def hexBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 2)

  /** Deterministic ≈`n`/256 sample: keeps rows whose bucket is below the
    * two-hex-digit `threshold` (e.g. "1a" → 26/256 ≈ 10.2%).
    */
  private def requireHex2(name: String, v: String): Unit =
    require(v.matches("[0-9a-f]{2}"),
      s"$name must be two lowercase hex digits (the md5 bucket domain), got '$v'")

  def hashSample(df: DataFrame, keyCol: String, threshold: String): DataFrame = {
    requireHex2("threshold", threshold)
    df.where(hexBucket(col(keyCol)) < lit(threshold))
  }

  /** Deterministic train/val/test assignment by hash bucket:
    * `[00, cc)` → train (204/256 ≈ 79.7%), `[cc, e6)` → val (≈ 10.2%),
    * `[e6, ff]` → test (≈ 10.2%).
    */
  def assignSplit(df: DataFrame, keyCol: String,
                  trainEnd: String = "cc", valEnd: String = "e6"): DataFrame = {
    requireHex2("trainEnd", trainEnd)
    requireHex2("valEnd", valEnd)
    val b = hexBucket(col(keyCol))
    df.withColumn("split",
      when(b < lit(trainEnd), "train")
        .when(b < lit(valEnd), "val")
        .otherwise("test"))
  }

  /** Sequential sequence packing: assign each document a `bin` so that
    * consecutive documents (ordered by `orderCol` within a `shardCol`
    * partition) accumulate into ~`budget`-token context windows —
    * `bin = floor(exclusive_prefix_sum(sizeCol) / budget)`, the streaming
    * packing rule training pipelines use to fill fixed-size contexts.
    *
    * Sharding keeps this scalable: the running sum is a window per shard
    * (one shuffle on the shard key), never a global single-task sort. A
    * document larger than `budget` occupies its own bin(s) boundary like
    * any run of documents would.
    */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
                    sizeCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("bin",
      (coalesce(sum(col(sizeCol).cast("long")).over(w), lit(0L)) / budget)
        .cast("long"))
  }
}
