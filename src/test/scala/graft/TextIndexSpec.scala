package graft

import graft.ops.TextIndex
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "beta gamma"),
    (3L, "alpha   beta\nbeta"),
    (4L, "gamma delta"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("driver-side bucketOf mirrors the featureBucket expression") {
    val terms = Seq("alpha", "beta", "gamma", "delta", "the", "x1", "")
    val fromExpr = terms.toDF("t")
      .select(col("t"), graft.functions.TextAnalysis.featureBucket(col("t"), 64).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { t =>
      assert(TextIndex.bucketOf(t, 64) == fromExpr(t), s"bucket mismatch for '$t'")
    }
  }

  test("conjunctive search matches a brute-force recompute, index prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("tindex").toString + "/idx"
    TextIndex.build(docs, dir, nBuckets = 64)

    // AND semantics: docs 1 and 3 carry both alpha and beta; score = tf sum
    val hits = TextIndex.search(spark, dir, Seq("alpha", "beta"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 3L, 3L -> 3L))

    // single-term search degrades to a posting lookup
    val solo = TextIndex.search(spark, dir, Seq("delta"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(solo == Map(4L -> 1L))

    // duplicate query terms don't double-count or break the AND arity
    val dup = TextIndex.search(spark, dir, Seq("alpha", "alpha", "beta"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup == Map(1L -> 3L, 3L -> 3L))

    // pruning is real: the term buckets arrive as a literal partition
    // filter, so only those partitions are listed/scanned
    val ex = TextIndex.search(spark, dir, Seq("alpha", "beta"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(ex).map(_.group(1))
    assert(pf.nonEmpty, "no PartitionFilters in the scan:\n" +
      ex.linesIterator.filter(_.contains("Partition")).mkString("\n"))
    val expected = Seq("alpha", "beta").map(TextIndex.bucketOf(_, 64)).distinct
    assert(expected.forall(b => pf.get.contains(b.toString)),
      s"expected buckets $expected in partition filter: ${pf.get}")
  }

  test("empty text and blank tokens never enter the postings") {
    val dir = java.nio.file.Files.createTempDirectory("tindex-blank").toString + "/idx"
    TextIndex.build(docs, dir, nBuckets = 8)
    val terms = spark.read.parquet(dir).select("term").distinct()
      .collect().map(_.getString(0)).toSet
    assert(terms == Set("alpha", "beta", "gamma", "delta"))
  }
}
