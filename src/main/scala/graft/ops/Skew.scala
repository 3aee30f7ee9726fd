package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; these
  * helpers cover the remaining cases — skewed AGGREGATIONS with expensive
  * per-group state (e.g. `collect_set`, exact distinct) and skewed
  * broadcast-side-too-big joins — via the classic two-stage salt pattern:
  *
  *   stage 1: group by (key, salt) — hot keys split across `buckets`
  *            reducers, each holding 1/buckets of the state;
  *   stage 2: group by key — merges `buckets` partial rows per key
  *            (tiny second shuffle).
  *
  * Plain `sum`/`count` DON'T need this (partial aggregation already
  * combines map-side); use it when per-group state is superlinear or when
  * one key dominates a stage's runtime.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from arbitrary spread
    * columns (falls back to a hash of the whole row via all columns).
    */
  def salt(buckets: Int, spreadCols: Column*): Column =
    pmod(hash(spreadCols: _*), lit(buckets))

  /** Two-stage salted distinct-count per key: exact, skew-proof.
    * Stage 1 dedups (key, salt, value) locally; stage 2 sums partial
    * distinct counts — correct because salt partitions the value space
    * (same value → same salt).
    */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column,
                          buckets: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .withColumn("_salt", salt(buckets, col("v")))
      .groupBy(col("k"), col("_salt"))
      .agg(countDistinct(col("v")).as("_partial"))
      .groupBy(col("k"))
      .agg(sum(col("_partial")).as("n_distinct"))

  /** Two-stage salted collect_set per key (bounded per-reducer state). */
  def saltedCollectSet(df: DataFrame, key: Column, value: Column,
                       buckets: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .withColumn("_salt", salt(buckets, col("v")))
      .groupBy(col("k"), col("_salt"))
      .agg(collect_set(col("v")).as("_partial"))
      .groupBy(col("k"))
      .agg(array_distinct(flatten(collect_list(col("_partial")))).as("values"))

  /** Salted join for a skewed left key against a modest right side: the
    * right side is replicated `buckets`× with an explicit salt column and
    * the join key becomes (key, salt) — hot left keys spread over
    * `buckets` tasks. Use when the right side is too big to broadcast and
    * AQE's split thresholds don't trigger.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
