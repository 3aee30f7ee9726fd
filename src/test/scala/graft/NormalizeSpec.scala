package graft

import graft.functions.{NormalizeText, TextAnalysis}
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Planted-Unicode coverage for the C46 normalization stage (the driver
  * corpus is ASCII, where normalization is the identity — same spec-only
  * policy as the PII scrub). All non-ASCII is spelled in \u escapes so
  * the planted forms survive any editor/VCS normalization of this file.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composed   = "caf\u00e9"         // e-acute, one codepoint
  private val decomposed = "cafe\u0301"        // e + combining acute

  private def norm(s: String, form: String = "NFC"): String =
    Seq(Tuple1(s)).toDF("t")
      .select(NormalizeText(col("t"), form).as("n"))
      .collect()(0).getString(0)

  test("NFC composes combining sequences; ASCII passes through unchanged") {
    assert(decomposed != composed)           // the plant is real
    assert(norm(decomposed) == composed)
    assert(norm(composed) == composed)       // already-NFC stays put
    assert(norm("plain ascii 123") == "plain ascii 123")
  }

  test("NFD decomposes; NFKC folds compatibility forms") {
    assert(norm(composed, "NFD") == decomposed)
    // fi ligature and fullwidth digits fold under NFKC, survive NFC
    assert(norm("\ufb01le \uff11\uff12", "NFKC") == "file 12")
    assert(norm("\ufb01le", "NFC") == "\ufb01le")
  }

  test("null propagates; bad form rejected") {
    val r = Seq((1L, null.asInstanceOf[String]), (2L, "x"))
      .toDF("id", "t")
      .select(NormalizeText(col("t")).as("n")).collect()
    assert(r(0).isNullAt(0) && r(1).getString(0) == "x")
    intercept[IllegalArgumentException] { NormalizeText(col("t"), "NFZ") }
  }

  test("generated code compiles (CODEGEN_ONLY) and matches interpreted eval") {
    val q = Seq(Tuple1(decomposed), Tuple1("ascii only")).toDF("t")
      .select(NormalizeText(col("t")).as("n"))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val generated =
      try q.collect().map(_.getString(0)).sorted.toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try q.collect().map(_.getString(0)).sorted.toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(generated == interpreted)
    assert(generated.contains(composed))
  }

  test("canonicalize makes encoding-variant docs exact-dup equal") {
    val docs = Seq(
      (1L, decomposed + "\u00a0au lait"),        // decomposed + NBSP
      (2L, composed + " au lait"),                // composed + plain space
      (3L, composed + "\u2003au\u0007 lait"),     // em space + BEL control
      (4L, "unrelated text")
    ).toDF("doc_id", "text")
    val canon = docs.select(col("doc_id"),
      TextAnalysis.canonicalize(col("text")).as("text"))
    val d = Dedup.exact(canon).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(d == Set((3L, 1L), (1L, 4L))) // 1,2,3 collapse; 4 alone
  }
}
