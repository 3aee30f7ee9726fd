package graft

import graft.functions.BpeTokenizer
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE walkthrough corpus (Sennrich et al. ACL 2016 §3.2
  // shape): low/lower/newest/widest with skewed counts
  val docs = Seq(
    (1L, ("low " * 5).trim),
    (2L, ("lower " * 2).trim),
    (3L, ("newest " * 6).trim),
    (4L, ("widest " * 3).trim)
  ).toDF("doc_id", "text")

  test("wordCounts: one corpus pass to the word vocabulary") {
    val wc = BpeTokenizer.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc == Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
  }

  test("learn: merges follow pair frequency with deterministic ties") {
    val merges = BpeTokenizer.learnFromCorpus(docs, numMerges = 4)
    assert(merges.length == 4)
    // "es" (9 = newest 6 + widest 3) wins round 1; then es+t (9), then
    // est+</w> (9); round 4 is the first genuinely data-dependent tie
    // region, but rounds 1-3 are forced
    assert(merges.take(3) == Seq(("e", "s"), ("es", "t"), ("est", BpeTokenizer.EndOfWord)))
    // relearning is bit-identical
    assert(BpeTokenizer.learnFromCorpus(docs, numMerges = 4) == merges)
  }

  test("learn saturates when no pair repeats") {
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val merges = BpeTokenizer.learnFromCorpus(tiny, numMerges = 10)
    assert(merges.isEmpty) // every pair occurs once
  }

  test("encode: greedy rank-first merging; concatenation round-trips") {
    val merges = BpeTokenizer.learnFromCorpus(docs, numMerges = 6)
    val enc = docs.select(col("doc_id"),
      BpeTokenizer.encode(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // newest = 6 repeats of the fully-merged form
    assert(enc(3L).distinct.forall(_.nonEmpty))
    // round-trip: stripping </w> and concatenating recovers the text
    val docText = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { case (id, toks) =>
      val rebuilt = toks.mkString("")
        .replace(BpeTokenizer.EndOfWord, " ").trim
      assert(rebuilt == docText(id))
    }
    // "est" learned as a unit: every "newest"/"widest" token stream
    // contains a subword ending in est</w> or est
    assert(enc(3L).exists(t => t.contains("est")))
    assert(enc(4L).exists(t => t.contains("est")))
  }

  test("encode with empty merge list falls back to characters") {
    val enc = Seq(Tuple1("ab c")).toDF("t")
      .select(BpeTokenizer.encode(col("t"), Seq.empty).as("toks"))
      .collect()(0).getSeq[String](0)
    assert(enc == Seq("a", "b", BpeTokenizer.EndOfWord, "c", BpeTokenizer.EndOfWord))
  }

  test("property: encode round-trips on random corpora at any merge count") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val wordGen = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val textGen = Gen.choose(1, 12)
      .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val corpusGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, textGen))
    val prop = Prop.forAll(corpusGen, Gen.choose(0, 20)) { (texts, n) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val merges = BpeTokenizer.learnFromCorpus(df, numMerges = n)
      val enc = df.select(col("doc_id"),
        BpeTokenizer.encode(col("text"), merges).as("toks"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        enc(i.toLong).mkString("").replace(BpeTokenizer.EndOfWord, " ").trim == t
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("non-BMP characters stay whole code points, never lone surrogates") {
    import spark.implicits._
    // two DIFFERENT astral characters: a per-UTF-16-unit split would
    // emit lone surrogates that UTF8String corrupts to '?', conflating
    // them into identical token streams
    val docs = Seq("𝕏 cat", "😀 cat").toDF("text")
    val toks = docs
      .select(BpeTokenizer.encode(col("text"), Seq.empty).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(toks(0) != toks(1), "distinct emoji must tokenize distinctly")
    assert(toks.flatten.forall(t => !t.contains("?")),
      s"no replacement chars expected, got ${toks.map(_.mkString("|")).mkString(" / ")}")
    // the astral char survives as one whole symbol and round-trips
    assert(toks(0).head.startsWith("𝕏"))
    assert(toks(1).head.startsWith("😀"))
  }

  test("generated code compiles (CODEGEN_ONLY) and matches interpreted eval") {
    val merges = BpeTokenizer.learnFromCorpus(docs, numMerges = 6)
    val q = docs.select(BpeTokenizer.encode(col("text"), merges).as("toks"))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val generated =
      try q.collect().map(_.getSeq[String](0).mkString("|")).sorted.toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try q.collect().map(_.getSeq[String](0).mkString("|")).sorted.toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(generated == interpreted && generated.nonEmpty)
  }
}
