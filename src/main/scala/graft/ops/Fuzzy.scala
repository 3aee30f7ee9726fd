package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join via symmetric-delete blocking (FastSS,
  * Bocek et al., U. Zurich TR 2007; popularized as SymSpell) — the
  * entity-resolution / fuzzy-matching join for dirty identifiers at scale
  * (names, titles, product codes) that an equi-join can't express and an
  * all-pairs `levenshtein` cross join can't survive.
  *
  * Exact-recall guarantee (pigeonhole over edit scripts): two strings
  * within Levenshtein distance `d` of each other share at least one
  * common string in their deletion neighborhoods of radius `d` (each side
  * deletes the positions the optimal edit script touches). So:
  *
  *   1. expand each string to its ≤`d`-deletion variants (map-side
  *      expression tree, `O(len^d)` variants per row, no shuffle);
  *   2. self-join on the variant string — bucket-local, exactly the LSH
  *      band-join shape of [[Dedup.minhashCandidates]] but with a
  *      provable no-false-negative contract;
  *   3. verify surviving DISTINCT pairs with one real `levenshtein`
  *      call per pair (never per variant collision).
  *
  * 100-TB shape: the only shuffle is the variant equi-join; candidate
  * buckets are real deletion neighborhoods, so bucket population is
  * bounded by the data's true duplication structure, not by corpus size.
  * The expensive O(len²) Levenshtein DP runs once per *candidate pair*,
  * after `distinct` — variant multiplicity (the same pair colliding in
  * many buckets) is collapsed before any DP work.
  *
  * `maxDist` supports 1 and 2 (the useful fuzzy-match radii; variant
  * counts are len+1 and ~len²/2 — radius 3+ explodes combinatorially and
  * is better served by n-gram filtering, see [[Dedup.prefixFilterJoin]]).
  */
object Fuzzy {

  /** All strings obtained by deleting at most `maxDeletes` (1 or 2)
    * characters from `s` — including `s` itself (0 deletions). Pure
    * expression tree (sequence/transform/filter/flatten), fully
    * codegen-friendly, no UDF.
    */
  def deletionVariants(s: Column, maxDeletes: Int): Column = {
    require(maxDeletes == 1 || maxDeletes == 2,
      s"maxDeletes must be 1 or 2, got $maxDeletes")
    // positions 1..len(s); empty array when s is empty (sequence(1,0) errors)
    val positions = when(length(s) >= 1, sequence(lit(1), length(s)))
      .otherwise(array().cast("array<int>"))
    val del1 = transform(positions, i =>
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    val base = concat(array(s), del1)
    if (maxDeletes == 1) base
    else {
      // exact-2 deletions at positions i < j of the ORIGINAL string
      val del2 = flatten(transform(positions, i =>
        transform(filter(positions, j => j > i), j =>
          concat(s.substr(lit(1), i - 1),
            s.substr(i + 1, j - i - 1),
            s.substr(j + 1, length(s))))))
      concat(base, del2)
    }
  }

  /** Self-join `df` on Levenshtein distance ≤ `maxDist` with exact
    * recall. Returns distinct (`id_a`, `id_b`, `dist`) with id_a < id_b.
    * `array_distinct` before the explode dedupes repeated variants (e.g.
    * "aab" deletes to "ab" two ways) so a pair collides once per distinct
    * shared variant, and the pair-level `distinct` runs BEFORE the
    * Levenshtein verify — one DP evaluation per candidate pair.
    *
    * Exact-duplicate strings are collapsed BEFORE the variant join (same
    * shape as `Dedup.prefixFilterJoin`'s duplicate collapse): n identical
    * strings would otherwise put an n-deep bucket on EVERY shared
    * variant and go quadratic inside the join; instead they contribute
    * one representative, their C(n,2) dist-0 pairs are generated
    * output-sized, and representative pairs expand member×member.
    *
    * The collapsed-group table is pinned (it feeds the intra-group pair
    * expansion AND both sides of the variant join); lifetime is
    * caller-managed — release with `spark.catalog.clearCache()` once the
    * result is materialized ([[graft.ops.Dedup]]'s module contract).
    */
  def editDistanceJoin(df: DataFrame, idCol: String = "id",
                       strCol: String = "s", maxDist: Int = 1): DataFrame = {
    val g = df.select(col(idCol).as("_fid"), col(strCol).as("_fs"))
      .groupBy(col("_fs"))
      .agg(min(col("_fid")).as("_rep"),
        collect_list(col("_fid")).as("_mem"), count(lit(1)).as("_n"))
      .transform(Caching.cached)
    val intra = g.where(col("_n") > 1)
      .select(explode(col("_mem")).as("id_a"), col("_mem"))
      .select(col("id_a"), explode(col("_mem")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dist", lit(0))
    val v = g.select(col("_rep").as("_fid"), col("_fs"),
      explode(array_distinct(deletionVariants(col("_fs"), maxDist))).as("_v"))
    val repPairs = v.as("a").join(v.as("b"),
        col("a._v") === col("b._v") && col("a._fid") < col("b._fid"))
      .select(col("a._fid").as("ra"), col("b._fid").as("rb"),
        col("a._fs").as("_sa"), col("b._fs").as("_sb"))
      .distinct()
      .withColumn("dist", levenshtein(col("_sa"), col("_sb")))
      .where(col("dist") <= maxDist)
    val expanded = repPairs
      .join(g.select(col("_rep").as("ra"), col("_mem").as("_ma")), Seq("ra"))
      .join(g.select(col("_rep").as("rb"), col("_mem").as("_mb")), Seq("rb"))
      .select(explode(col("_ma")).as("a"), col("_mb"), col("dist"))
      .select(col("a"), explode(col("_mb")).as("b"), col("dist"))
      .select(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b"), col("dist"))
    expanded.unionByName(intra)
  }
}
