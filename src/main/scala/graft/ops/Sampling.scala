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

  /** An internal column name not colliding with (and silently dropping)
    * any of `df`'s columns.
    */
  private[ops] def fresh(df: DataFrame, base: String): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(n => !df.columns.contains(n)).get

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

  /** Leakage-safe train/val/test assignment: split by duplicate CLUSTER,
    * not by document — near-duplicate docs land in the SAME split, so a
    * test doc never has a training-set twin (the eval-contamination
    * failure a per-doc hash split cannot prevent; splitting before
    * deduplicating is the classic benchmark-inflation bug). `pairs` is
    * any candidate/verified duplicate-pair table (`id_a`, `id_b` — LSH
    * candidates, prefix-join survivors, …); docs in no pair form their
    * own singleton cluster. Assignment hashes the cluster's canonical
    * (min) id with the same md5 rule as [[assignSplit]], so it stays
    * deterministic and growth-stable as long as the cluster's minimum
    * member is stable.
    *
    * Scale shape: [[Dedup.clusters]]' O(log diameter) label propagation
    * over the pair graph (pairs only — never corpus-wide), one left join
    * to carry labels back, map-side split assignment. Returns `docs` +
    * `cluster_id` + `split`.
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       idCol: String = "doc_id",
                       trainEnd: String = "cc", valEnd: String = "e6"): DataFrame = {
    val labeled = docs
      .join(Dedup.clusters(pairs).withColumnRenamed("doc_id", idCol),
        Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    assignSplit(labeled, "cluster_id", trainEnd, valEnd)
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

  /** Per-group mixture sampling (domain mixing): each row keeps with a
    * rate chosen by its `groupCol` value — e.g. keep 80% of `en` but 10%
    * of everything else when rebalancing a crawl's language mix. Same
    * deterministic md5-threshold membership as [[hashSample]] (pure
    * map-side, reproducible, growth-stable), just with the threshold
    * selected per group; `thresholds` maps group value → two-hex-digit
    * cutoff, `default` applies to unlisted groups ("00" drops them).
    */
  def mixtureSample(df: DataFrame, keyCol: String, groupCol: String,
                    thresholds: Map[String, String],
                    default: String = "00"): DataFrame = {
    (thresholds.values.toSeq :+ default).foreach(requireHex2("threshold", _))
    val cutoff = thresholds.foldLeft(lit(default)) { case (acc, (g, t)) =>
      when(col(groupCol) === g, t).otherwise(acc)
    }
    df.where(hexBucket(col(keyCol)) < cutoff)
  }

  /** Systematic probability-proportional-to-size sample (≈`k` rows): lay
    * the rows out on a line ordered by `orderCol`, each covering an
    * interval as long as its `weightCol`, and keep every row whose
    * interval contains a multiple of `stride = total_weight / k` — the
    * classic PPS systematic design, made deterministic (no `rand()`) and
    * engine-exact (all arithmetic is integer, so an oracle running the
    * same formula selects the identical set).
    *
    * Scale shape: the naive form is one GLOBAL running sum — a
    * single-task window. Here the prefix sum is two-level: an in-shard
    * window (one shuffle on `shard = orderCol div shardSize`) plus a
    * shard-offset table of only `max(orderCol)/shardSize` rows — small
    * enough for its own single-task window and a broadcast join back.
    * `orderCol` must be a non-negative integer key (a dense row id keeps
    * shards balanced); `weightCol` must be a non-negative integer.
    *
    * Sizing: the offset table must stay broadcastable, so pick
    * `shardSize ≈ n / 10^5..10^6`. The 4096 default holds to ~10^9 rows
    * (≈250k offsets); at 10^11+ rows raise it (e.g. 10^6 → 10^5
    * offsets) — the in-shard window stays balanced as long as ids are
    * dense.
    */
  def systematicSample(df: DataFrame, orderCol: String, weightCol: String,
                       k: Int, shardSize: Long = 4096): DataFrame =
    systematicCore(df, Nil, orderCol, weightCol, k, shardSize)

  /** [[systematicSample]] stratified by `groupCol`: an independent
    * systematic PPS draw of ≈`k` rows WITHIN each group — the
    * token-budgeted per-language/per-source corpus draw (every stratum
    * gets its own stride `group_total / k`, so each contributes roughly
    * equal total weight regardless of its size). Same two-level prefix
    * sum; the windows partition by (group, shard) and the offset table
    * grows only by the group count.
    */
  def systematicSamplePerGroup(df: DataFrame, groupCol: String,
                               orderCol: String, weightCol: String,
                               k: Int, shardSize: Long = 4096): DataFrame =
    systematicCore(df, Seq(groupCol), orderCol, weightCol, k, shardSize)

  private def systematicCore(df: DataFrame, groupCols: Seq[String],
                             orderCol: String, weightCol: String,
                             k: Int, shardSize: Long): DataFrame = {
    require(k >= 1 && shardSize >= 1, "k and shardSize must be positive")
    import org.apache.spark.sql.expressions.Window
    val sh = fresh(df, "_graft_shard"); val cum = fresh(df, "_graft_cum")
    val off = fresh(df, "_graft_off"); val tot = fresh(df, "_graft_tot")
    val st = fresh(df, "_graft_shard_total")
    val g = groupCols.map(col)
    val w = col(weightCol).cast("long")
    val sharded = df.withColumn(sh,
      expr(s"cast(`$orderCol` as bigint) div $shardSize"))
    val inShard = Window.partitionBy(g :+ col(sh): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the offset windows are one-task-per-group by construction, but only
    // over the tiny per-shard totals — never the data. The ungrouped case
    // still gets a (constant, but NON-FOLDABLE — pmod of a column) partition
    // key: a plain literal is stripped by EliminateWindowPartitions and the
    // intentional single-partition window would drown logs in WindowExec
    // warnings.
    val pg = if (g.isEmpty) Seq(pmod(col(sh), lit(1))) else g
    val wOff = Window.partitionBy(pg: _*).orderBy(col(sh))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(pg: _*).orderBy(col(sh))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = sharded.groupBy(g :+ col(sh): _*).agg(sum(w).as(st))
      .select(g :+ col(sh) :+
        coalesce(sum(col(st)).over(wOff), lit(0L)).as(off) :+
        sum(col(st)).over(wTot).as(tot): _*)
    val stride = fresh(df, "_graft_stride")
    sharded
      .withColumn(cum, sum(w).over(inShard))
      .join(broadcast(offsets), groupCols :+ sh)
      .withColumn(cum, col(off) + col(cum))
      .withColumn(stride, greatest(expr(s"`$tot` div $k"), lit(1L)))
      // integer `div` on both sides — bit-exact, so an oracle running the
      // same formula selects the identical row set
      .where(expr(s"(`$cum` div `$stride`) > " +
        s"((`$cum` - cast(`$weightCol` as bigint)) div `$stride`)"))
      .drop(sh, cum, off, tot, stride)
  }

  /** Exact top-`k` rows per key by `(order, tiebreak)` WITHOUT a
    * single-task-per-key sort: stage 1 ranks inside `(key, salt)` — no
    * window partition exceeds ~1/`salts` of a key — and stage 2 re-ranks
    * the ≤ `salts`·`k` survivors per key. Any global top-k row is also
    * top-k in its salt bucket, so the result provably equals the naive
    * single-window form; the spec checks it on a skewed corpus. This is
    * the shape that holds when one key is 10% of a 100 TB dataset (e.g.
    * per-domain quota sampling over a crawl).
    *
    * `tiebreak` must make `(order, tiebreak)` unique per key (e.g. a doc
    * id) or top-k itself is ill-defined.
    */
  def topKPerKey(df: DataFrame, key: Column, order: Column, tiebreak: Column,
                 k: Int, salts: Int = 16): DataFrame = {
    require(k >= 1 && salts >= 1, "k and salts must be positive")
    import org.apache.spark.sql.expressions.Window
    // pmod is non-negative for a positive modulus, so no abs() — which
    // would raise on hash() == Int.MinValue under ANSI
    val salt = pmod(hash(tiebreak), lit(salts))
    val rn1 = fresh(df, "_graft_rn1"); val rn = fresh(df, "_graft_rn")
    val salted = Window.partitionBy(key, salt).orderBy(order, tiebreak)
    val whole = Window.partitionBy(key).orderBy(order, tiebreak)
    df.withColumn(rn1, row_number().over(salted)).where(col(rn1) <= k)
      .withColumn(rn, row_number().over(whole)).where(col(rn) <= k)
      .drop(rn1, rn)
  }

  /** Deterministic source-interleaved epoch order: every doc gets a SORT
    * KEY such that reading in key order (a) visits docs in a
    * pseudo-random shuffle (rank within source by md5 of the id — same
    * deterministic-hash idiom as [[hashSample]]) and (b) interleaves
    * sources proportionally to their size — each source's docs sit at
    * evenly-spaced key positions, so any contiguous slice of the epoch
    * has ≈ the corpus's source mix. The key is the doc's fractional
    * position within its source in exact fixed point:
    * `(2·rank − 1) · 10^12 div (2 · source_total)` — integer arithmetic,
    * engine-exact, collision-broken by (key, id).
    *
    * The op emits KEYS, not sorted rows: the write path range-partitions
    * by `epoch_key` (a sort at write time is the one legitimate global
    * sort in a training pipeline); keeping the sort out of this operator
    * keeps every read-side plan shuffle-free — one window on source.
    */
  def epochOrderKeys(docs: DataFrame, sourceCol: String,
                     idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rn = fresh(docs, "_graft_rank"); val tot = fresh(docs, "_graft_total")
    val bySource = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val totals = Window.partitionBy(col(sourceCol))
    docs
      .withColumn(rn, row_number().over(bySource).cast("long"))
      .withColumn(tot, count(lit(1)).over(totals))
      // the (2·rank−1)·10^12 intermediate would overflow BIGINT past
      // ~4.6M docs per source; decimal(38) keeps it exact at any corpus
      // size and the quotient (< 10^12) lands back in a long
      .withColumn("epoch_key",
        expr(s"(cast(2 * `$rn` - 1 as decimal(38, 0)) * 1000000000000)" +
          s" div (2 * `$tot`)"))
      .drop(rn, tot)
  }

  /** Split each document into fixed-size training chunks of `maxTokens`
    * tokens with `overlap` tokens of context carried between consecutive
    * chunks (stride = maxTokens − overlap) — the standard sequence-prep
    * step before packing. Chunk `i` covers tokens `[i·stride, i·stride +
    * maxTokens)`; a start past the first is emitted only when it
    * contributes tokens the previous chunk didn't cover, so no chunk is a
    * suffix-duplicate of its predecessor.
    *
    * Map-side only: token slicing is a pure expression tree (sequence →
    * filter → transform → posexplode) — no UDF, no shuffle; at 100 TB
    * chunking is free relative to the scan.
    *
    * Output: `(idCol, chunk_id, chunk, n_tokens)`.
    */
  def chunkDocuments(docs: DataFrame, maxTokens: Int, overlap: Int = 0,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val l = split(col(textCol), " ")
    val n = size(l)
    val starts = filter(
      sequence(lit(0), greatest(n - 1, lit(0)), lit(stride)),
      s => (s === 0 && n > 0) || (s + overlap) < n)
    docs
      .select(col(idCol), posexplode(
        transform(starts, s => array_join(slice(l, s + 1, lit(maxTokens)), " ")))
        .as(Seq("chunk_id", "chunk")))
      .withColumn("n_tokens", size(split(col("chunk"), " ")))
  }
}
