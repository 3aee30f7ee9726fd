package graft

import graft.ops.{Ann, Dedup}
import org.apache.spark.sql.functions._

/** Round-9 operators: semantic decontamination scan (Ann.maxCosineVs),
  * cross-source duplication matrix (Dedup.crossSourceMatrix), and the
  * temperature-scaled mixture-rate query (q_mix_rates).
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  // Orthogonal-ish planted vectors: v1 ∥ b1, v2 ∥ b2 (scaled — cosine is
  // scale-invariant), v3 orthogonal to both, v4 null.
  private val bench = Seq(
    Tuple1(Seq(1f, 0f, 0f)),
    Tuple1(Seq(0f, 1f, 0f))
  ).toDF("qv")
  private val corpus = Seq(
    (1L, Seq(2f, 0f, 0f)),
    (2L, Seq(0f, 0.5f, 0f)),
    (3L, Seq(0f, 0f, 3f)),
    (4L, null.asInstanceOf[Seq[Float]])
  ).toDF("vec_id", "embedding")

  test("maxCosineVs: max over the benchmark set, map-side exact") {
    val got = Ann.maxCosineVs(corpus, bench)
      .select("vec_id", "max_cos").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L).contains(1.0)) // parallel to b1
    assert(got(2L).contains(1.0)) // parallel to b2
    assert(got(3L).contains(0.0)) // orthogonal to both
    assert(got(4L).isEmpty)       // null vector -> null score
  }

  test("maxCosineVs: matches a brute-force per-benchmark max") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val b = emb.where(col("vec_id") < 4).select(col("embedding").as("qv"))
    val fused = Ann.maxCosineVs(emb.where(col("vec_id") >= 4), b)
      .select("vec_id", "max_cos")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val brute = emb.where(col("vec_id") >= 4).crossJoin(broadcast(b))
      .select(col("vec_id"),
        graft.functions.CosineSimilarity(col("embedding"), col("qv")).as("c"))
      .groupBy("vec_id").agg(max(col("c")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused == brute) // bit-identical, not approximately equal
  }

  test("maxCosineVs: empty benchmark is rejected loudly") {
    val ex = intercept[IllegalArgumentException] {
      Ann.maxCosineVs(corpus, bench.limit(0))
    }
    assert(ex.getMessage.contains("non-empty"))
  }

  test("crossSourceMatrix: attributes verified near-dup pairs to source cells") {
    val base = "the quick brown fox jumps over the lazy dog near the river"
    val docs = Seq(
      (1L, s"$base bank", "mirrorA"),
      (2L, s"$base bank", "mirrorB"),  // exact dup of 1, cross-source
      (3L, s"$base delta", "mirrorA"), // near dup of 1, within+cross source
      (4L, "completely different content about spark catalyst optimizer rules engine", "clean")
    ).toDF("doc_id", "text", "source")
    val cells = Dedup.crossSourceMatrix(docs, threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache() // pinned candidate table is caller-managed
    // pairs: (1,2) mirrorA-mirrorB, (1,3) mirrorA-mirrorA, (2,3) mirrorA-mirrorB
    assert(cells == Map(("mirrorA", "mirrorB") -> 2L, ("mirrorA", "mirrorA") -> 1L))
  }

  test("crossSourceMatrix: a sub-threshold pair never lands in a cell") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "s1"),
      (2L, "alpha beta gamma completely different tail words here now", "s2")
    ).toDF("doc_id", "text", "source")
    assert(Dedup.crossSourceMatrix(docs, threshold = 0.9).count() === 0)
    spark.catalog.clearCache()
  }

  test("maxCosineVs: NULL benchmark vectors are rejected loudly") {
    val withNull = bench.unionByName(
      Seq(Tuple1(null.asInstanceOf[Seq[Float]])).toDF("qv"))
    val ex = intercept[IllegalArgumentException] {
      Ann.maxCosineVs(corpus, withNull)
    }
    assert(ex.getMessage.contains("NULL"))
  }

  // a 6-copy verbatim clique across two sources + one near-dup pair:
  // population guard 4 diverts BOTH clique bands (population 6 > 4) but
  // must not touch the near-dup pair (population 2)
  private def guardDocs = {
    val boiler = "verbatim boilerplate sentence repeated across the whole " +
      "crawl exactly the degenerate band scenario the population guard diverts"
    val clique = (1L to 6L).map(i =>
      (i, boiler, if (i <= 4) "srcA" else "srcB"))
    val near = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank", "srcA"),
      (11L, "the quick brown fox jumps over the lazy dog near the river delta", "srcB"))
    (clique ++ near).toDF("doc_id", "text", "source")
  }

  test("crossSourceMatrix: population guard keeps cells exact for verbatim cliques") {
    val unguarded = Dedup.crossSourceMatrix(guardDocs, threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache()
    val guarded = Dedup.crossSourceMatrix(guardDocs, threshold = 0.5,
      maxBandPopulation = 4L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache()
    // clique: srcA 4 docs -> C(4,2)=6 diagonal; srcB 2 -> 1; cross 4*2=8;
    // near pair adds 1 to (srcA, srcB)
    val expect = Map(("srcA", "srcA") -> 6L, ("srcB", "srcB") -> 1L,
      ("srcA", "srcB") -> 9L)
    assert(unguarded == expect, s"unguarded: $unguarded")
    assert(guarded == expect, s"guarded: $guarded")
  }

  test("nearDedup: population guard still collapses the diverted clique") {
    val out = Dedup.nearDedup(guardDocs, score = col("doc_id") * -1,
      threshold = 0.5, maxBandPopulation = 4L)
      .collect().map(r => r.getLong(0) -> (r.getAs[Any]("cluster_id"), r.getBoolean(3)))
      .toMap
    spark.catalog.clearCache()
    // the 6-doc clique is one cluster keeping exactly one doc
    val cliqueClusters = (1L to 6L).map(out(_)._1).toSet
    assert(cliqueClusters.size == 1, s"clique split: $cliqueClusters")
    assert((1L to 6L).count(out(_)._2) == 1)
    // the near-dup pair still clusters (its band was under the cap)
    assert(out(10L)._1 == out(11L)._1)
  }

  test("q_mix_rates: alpha-scaling flattens the mixture and stays a distribution") {
    val rows = SparkEntry.queries("q_mix_rates")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length > 1)
    // each column is a ppm distribution (floor division loses < n_sources ppm)
    for (i <- 3 to 5) {
      val s = rows.map {
        case (_, raw, a5, a25) => Seq(raw, a5, a25)(i - 3)
      }.sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"column $i sums to $s")
    }
    // temperature scaling: the smallest source gains share, the largest
    // loses, and alpha=0.25 flattens harder than alpha=0.5
    val smallest = rows.minBy(_._2)
    val largest = rows.maxBy(_._2)
    assert(smallest._4 >= smallest._3 && smallest._3 >= smallest._2,
      s"small source should gain: $smallest")
    assert(largest._4 <= largest._3 && largest._3 <= largest._2,
      s"large source should lose: $largest")
  }
}
