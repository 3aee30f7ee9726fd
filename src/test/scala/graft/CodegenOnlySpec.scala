package graft

import graft.functions.{ByteHistogram, MinHashSignature, RepetitionStats, SimHashSignature, SortedIntersectCount, TextAnalysis}
import org.apache.spark.sql.functions._

/** Every custom scalar expression must produce COMPILING generated code:
  * under the default FALLBACK factory mode a codegen bug silently drops
  * the whole predicate/projection to interpreted mode (exactly how
  * Spark 4.1.2's own `typeof` regressed — see TypeOfExpression), so this
  * suite pins CODEGEN_ONLY, where a broken template fails the test.
  */
class CodegenOnlySpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions compile under CODEGEN_ONLY and match eval") {
    val df = Seq(
      "alpha beta gamma alpha beta delta words more words",
      "x y", "one").toDF("text")
    val q = df.select(
      $"text",
      ByteHistogram($"text", 8).as("bh"),
      SimHashSignature($"text", 64).as("sh"),
      MinHashSignature($"text", 4, 3).as("mh"),
      RepetitionStats(TextAnalysis.tokens($"text")).as("rs"),
      SortedIntersectCount(
        sort_array(array_distinct(TextAnalysis.tokens($"text"))),
        sort_array(array(lit("alpha"), lit("beta"), lit("zeta")))).as("sic"))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val generated =
      try q.collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try q.collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(generated == interpreted)
    // short doc ("x y") has < 3 tokens: minhash must be null in both paths
    assert(generated.exists(_.contains("null")))
  }
}
