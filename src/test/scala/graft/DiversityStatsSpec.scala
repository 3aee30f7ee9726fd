package graft

import graft.functions.{DiversityStats, TextAnalysis}
import org.apache.spark.sql.functions._

class DiversityStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(texts: String*) =
    texts.toDF("text")
      .select($"text", DiversityStats(TextAnalysis.tokens($"text")).as("v"))
      .select($"text", $"v.w", $"v.d", $"v.c2")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("ground truth: token count, types, squared-count sum") {
    val s = stats("a b a b a", "x x x x", "lone", "a b c d")
    // "a b a b a": counts a=3 b=2 → c2 = 9 + 4
    assert(s("a b a b a") == (5L, 2L, 13L))
    // "x x x x": one type, c2 = 16 → Simpson (16-16)/16 = 0
    assert(s("x x x x") == (4L, 1L, 16L))
    assert(s("lone") == (1L, 1L, 1L))
    // all unique: c2 = w → Simpson (16-4)/16 = 0.75
    assert(s("a b c d") == (4L, 4L, 4L))
  }

  test("null elements are skipped entirely") {
    val got = Seq(1).toDF("i")
      .select(DiversityStats(array(lit("a"), lit(null), lit("a"))).as("v"))
      .select($"v.w", $"v.d", $"v.c2").collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((2L, 1L, 4L)))
  }

  test("empty array yields all zeros") {
    val got = Seq(1).toDF("i")
      .select(DiversityStats(array().cast("array<string>")).as("v"))
      .select($"v.w", $"v.d", $"v.c2").collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("parity with the exploded aggregation on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exploded = docs
      .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum($"c").as("w"), count(lit(1)).as("d"), sum($"c" * $"c").as("c2"))
    val fused = docs
      .select($"doc_id", DiversityStats(TextAnalysis.tokens($"text")).as("v"))
      .select($"doc_id", $"v.w".as("w"), $"v.d".as("d"), $"v.c2".as("c2"))
    assert(fused.exceptAll(exploded).isEmpty && exploded.exceptAll(fused).isEmpty)
    assert(fused.count() > 0)
  }

  test("generated code compiles (CODEGEN_ONLY, no fallback)") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try assert(stats("a b a")("a b a") == (3L, 2L, 5L))
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("rejects non-array input") {
    val err = intercept[Exception] {
      Seq("x").toDF("t").select(DiversityStats($"t")).collect()
    }
    assert(err.getMessage.contains("array<string>"))
  }
}
