package graft

import graft.functions.{TextAnalysis, Tokenize}
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Pins the engine-wide tokenization policy across its three
  * implementations: the native JVM tokenizer ([[Tokenize]]), the DataFrame
  * expression ([[TextAnalysis.tokens]]), and — by construction, since both
  * mirror `string_split(trim(regexp_replace(text,'[ \t\n\f\r]+',' ','g')),' ')`
  * — the DuckDB oracle SQL. Edge cases: tab/newline-edged text, interior
  * `\x0B` (NOT whitespace in RE2, unlike Java's `\s`), all-whitespace, and
  * empty text.
  */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  val edgeTexts = Seq(
    "plain space text",
    "\tleading tab",
    "trailing newline\n",
    "\r\n edged \t both \f",
    "innervtab stays one-token",
    "collapse   runs\t\there",
    "   ",
    "")

  test("native tokenizer == DataFrame tokenizer on whitespace edge cases") {
    val df = edgeTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.tokens(col("text")).as("toks"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    edgeTexts.zipWithIndex.foreach { case (text, i) =>
      assert(got(i) == Tokenize.tokens(text).toList,
        s"policy divergence on ${text.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
    // spot-check the policy itself
    assert(Tokenize.tokens("\tleading tab").toList == List("leading", "tab"))
    assert(Tokenize.tokens("innervtab x").toList == List("innervtab", "x"))
    assert(Tokenize.tokens("   ").toList == List(""))
    assert(Tokenize.tokens("").toList == List(""))
  }

  test("native MinHash signature == exploded DataFrame formulation on edge text") {
    val docs = edgeTexts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    // exploded reference formulation, built from the DataFrame tokenizer
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))
      .where(size(col("l")) >= 3)
    val sh = toks.select(col("doc_id"), explode(transform(
      sequence(lit(0), size(col("l")) - 3),
      i => concat_ws(" ", element_at(col("l"), i + 1),
        element_at(col("l"), i + 2), element_at(col("l"), i + 3)))).as("shingle"))
    val expected = sh.select(col("doc_id"), md5(col("shingle")).as("h"))
      .groupBy("doc_id")
      .agg(min(substring(col("h"), 1, 8)).as("h0"), min(substring(col("h"), 9, 8)).as("h1"),
        min(substring(col("h"), 17, 8)).as("h2"), min(substring(col("h"), 25, 8)).as("h3"))
      .collect().map(r => r.getInt(0) -> (1 to 4).map(r.getString).toList).toMap
    val native = Dedup.minhash(docs)
      .collect().map(r => r.getInt(0) -> (1 to 4).map(r.getString).toList).toMap
    assert(native == expected)
  }

  test("native SimHash == exploded DataFrame formulation on edge text; NULL text dropped") {
    val docs = (edgeTexts.zipWithIndex.map(_.swap) :+ (99, null))
      .toDF("doc_id", "text")
    val votes = docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(15))).as("b"), col("h"))
      .groupBy("doc_id", "b")
      .agg(sum(when(expr("substr(h, b + 1, 1)") < "8", 1).otherwise(-1)).as("v"))
    val expected = votes
      .groupBy("doc_id")
      .agg(sum(when(col("v") > 0, expr("shiftleft(1L, cast(b as int))")).otherwise(0L))
        .cast("long").as("simhash"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val native = Dedup.simhash(docs)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(native == expected)
    assert(!native.contains(99)) // NULL text emits no row, matching the oracle
  }
}
