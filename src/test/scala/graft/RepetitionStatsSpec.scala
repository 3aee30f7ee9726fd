package graft

import graft.functions.{RepetitionStats, TextAnalysis}
import org.apache.spark.sql.functions._

class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(texts: String*) =
    texts.toDF("text")
      .select($"text", RepetitionStats(TextAnalysis.tokens($"text")).as("r"))
      .select($"text", $"r.w", $"r.d", $"r.maxc", $"r.nbg")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("ground truth: counts, distinct, bigram mode") {
    val s = stats("a b a b a", "x x x x", "lone", "a b c d")
    // "a b a b a": 5 tokens, 2 distinct; bigrams a-b a-b, b-a b-a → max 2 of 4
    assert(s("a b a b a") == (5L, 2L, 2L, 4L))
    // "x x x x": bigram "x x" ×3
    assert(s("x x x x") == (4L, 1L, 3L, 3L))
    // single token: no bigrams
    assert(s("lone") == (1L, 1L, 0L, 0L))
    // all unique: every bigram count 1
    assert(s("a b c d") == (4L, 4L, 1L, 3L))
  }

  test("whitespace runs collapse exactly like the engine tokenizer") {
    val s = stats("a  b\t b\n a")
    assert(s("a  b\t b\n a") == (4L, 2L, 1L, 3L))
  }

  test("bigram keys cannot collide across token boundaries") {
    // "a b" + "c" vs "a" + "b c" — tokens never contain spaces, so the
    // space-joined keys are distinct pairs; maxc must stay 1
    val s = stats("a b c a b c")
    assert(s("a b c a b c") == (6L, 3L, 2L, 5L)) // "a b","b c" each twice...
  }

  test("parity with the exploded aggregation on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = docs
      .select($"doc_id", TextAnalysis.tokens($"text").as("l"))
      .where(size($"l") >= 2)
    val exploded = base
      .select($"doc_id", explode(transform(
        sequence(lit(1), size($"l") - 1),
        i => concat(element_at($"l", i), lit(" "), element_at($"l", i + 1)))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max($"c").as("maxc"), sum($"c").as("nbg"))
      .join(base, "doc_id")
      .select($"doc_id", size($"l").cast("long").as("w"),
        size(array_distinct($"l")).cast("long").as("d"), $"maxc", $"nbg")
    val fused = docs
      .select($"doc_id", RepetitionStats(TextAnalysis.tokens($"text")).as("r"))
      .where($"r.w" >= 2)
      .select($"doc_id", $"r.w", $"r.d", $"r.maxc", $"r.nbg")
    assert(fused.exceptAll(exploded).isEmpty && exploded.exceptAll(fused).isEmpty)
    assert(fused.count() > 0)
  }

  test("null elements break the bigram chain and count toward nothing") {
    val got = Seq(1).toDF("i")
      .select(RepetitionStats(array(lit("a"), lit(null), lit("a"), lit("a"))).as("r"))
      .select($"r.w", $"r.d", $"r.maxc", $"r.nbg").collect()(0)
    // 4 slots, 1 distinct token, one real bigram "a a" (the null resets
    // the chain) — nbg must be 1, not w-1=3
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      == ((4L, 1L, 1L, 1L)))
  }

  test("generated code compiles (CODEGEN_ONLY, no fallback)") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try assert(stats("x x x x")("x x x x") == (4L, 1L, 3L, 3L))
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("rejects non-array input") {
    val err = intercept[Exception] {
      Seq("x").toDF("t").select(RepetitionStats($"t")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
