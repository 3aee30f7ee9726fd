package graft

import graft.functions.TextAnalysis
import graft.ops.Ann
import org.apache.spark.sql.functions._

/** Specs for the hashing-trick operators (DSIR importance weights, the
  * linear model-quality filter) and int8-quantized ANN.
  */
class HashedFeatureSpec extends SparkSpec {
  import spark.implicits._

  // a corpus with a clear target domain: "wiki" docs are alpha-heavy,
  // "web" docs are spam-heavy; doc 5 is an alpha-heavy web doc that DSIR
  // should up-weight relative to its spam-heavy siblings
  val docs = Seq(
    (0L, "alpha beta gamma delta alpha beta gamma delta", "wiki"),
    (1L, "alpha beta gamma delta epsilon zeta alpha beta", "wiki"),
    (2L, "spam spam buy now spam click here spam spam", "web"),
    (3L, "click buy spam now here spam click buy spam", "web"),
    (4L, "alpha beta gamma delta epsilon alpha beta gamma", "web")
  ).toDF("doc_id", "text", "source")

  test("featureBucket is deterministic and within range") {
    val b = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .select(TextAnalysis.featureBucket(col("t"), 64).as("b"))
      .collect().map(_.getLong(0))
    assert(b.forall(x => x >= 0 && x < 64))
    val again = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .select(TextAnalysis.featureBucket(col("t"), 64).as("b"))
      .collect().map(_.getLong(0))
    assert(b.toSeq == again.toSeq)
  }

  test("dsirWeights up-weights target-like docs, invariant to partitioning") {
    def weights(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      TrainingQueries.dsirWeights(df, col("source") === "wiki", buckets = 256)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val w = weights(docs)
    assert(w.size == 5)
    // target docs score above the spam docs, and the alpha-heavy web doc
    // scores like the target, not like its source siblings
    assert(w(0L) > w(2L) && w(1L) > w(3L))
    assert(w(4L) > w(2L))
    // order-independence: a different partitioning yields identical weights
    assert(weights(docs.repartition(7)) == w)
  }

  test("modelQualityScore: bounded integer scores, keep == score>=0") {
    val r = TrainingQueries.modelQualityScore(docs, buckets = 256).collect()
    assert(r.length == 5)
    r.foreach { row =>
      val score = row.getLong(2)
      assert(score >= -1000 && score <= 1000)
      assert(row.getBoolean(3) == (score >= 0))
    }
    // deterministic across partitionings
    val again = TrainingQueries.modelQualityScore(docs.repartition(3), buckets = 256)
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(2)).toMap
    assert(again == r.map(r0 => r0.getLong(0) -> r0.getLong(2)).toMap)
  }

  test("sourceDrift: skewed source drifts more than a corpus-like one; invariant to partitioning") {
    // wiki+web averages to the corpus; an extra balanced source sits near
    // the mix, the spam-only sources sit far from it
    def drift(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      TrainingQueries.sourceDrift(df, buckets = 64)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val balanced = docs.union(Seq(
      (5L, "alpha beta spam click gamma now delta here", "mix")
    ).toDF("doc_id", "text", "source"))
    val d = drift(balanced)
    assert(d.keySet == Set("wiki", "web", "mix"))
    assert(d.values.forall(v => v >= 0 && v <= 1000000))
    // the mixed-vocabulary source tracks the corpus distribution more
    // closely than the domain-pure sources
    assert(d("mix") < d("wiki") && d("mix") < d("web"))
    assert(drift(balanced.repartition(5)) == d)
  }

  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
    (4L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
    (5L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // zero vector: quantizes to zeros
  ).toDF("vec_id", "embedding")

  test("quantizeInt8: max-|x| element maps to ±127, zero vector to zeros") {
    val q = vecs.select(col("vec_id"), Ann.quantizeInt8(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(q(0L) == Seq(127L, 0L, 0L, 0L))
    // floor(-1.0 * 127 / 1.0) = -127
    assert(q(3L) == Seq(-127L, 0L, 0L, 0L))
    assert(q(4L) == Seq(127L, 127L, 127L, 127L))
    assert(q(5L) == Seq(0L, 0L, 0L, 0L))
    assert(q.values.flatten.forall(x => x >= -127 && x <= 127))
  }

  test("int8TopK: self is rank 1 at cos 1, rescored order matches exact cosine") {
    val query = vecs.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val r = Ann.int8TopK(vecs.where(col("vec_id") =!= 5), query, k = 3, rerank = 5)
      .collect()
    assert(r.head.getLong(0) == 0L)
    assert(math.abs(r.head.getDouble(2) - 1.0) < 1e-12)
    // exact-rescored ranking: 1 (near-parallel) beats 4 (45 degrees off)
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 4L))
    // rescored cosines descend
    val cos = r.map(_.getDouble(2)).toSeq
    assert(cos == cos.sorted.reverse)
  }

  test("int8TopK rejects a rerank window smaller than k") {
    val query = vecs.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    intercept[IllegalArgumentException] {
      Ann.int8TopK(vecs, query, k = 10, rerank = 5)
    }
  }
}
