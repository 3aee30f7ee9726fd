package graft

import graft.functions.ByteHistogram
import org.apache.spark.sql.functions._

class ByteHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("ground truth: dims-bucketed codepoint sums") {
    // "abcdefghij": a=97..j=106; dim d sums codepoints at positions d, d+8
    val got = Seq("abcdefghij").toDF("text")
      .select(ByteHistogram($"text", 8)).collect()(0).getSeq[Long](0)
    assert(got == Seq(97L + 105, 98L + 106, 99, 100, 101, 102, 103, 104))
  }

  test("short text truncates to length, not padded with zeros") {
    val got = Seq("abc").toDF("text")
      .select(ByteHistogram($"text", 8)).collect()(0).getSeq[Long](0)
    assert(got == Seq(97L, 98L, 99L))
  }

  test("empty string yields empty array; null stays null") {
    val rows = Seq(Some(""), None).toDF("text")
      .select(ByteHistogram($"text", 8)).collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).isNullAt(0))
  }

  test("codepoint semantics match ascii(substr) on non-ASCII text") {
    // é = U+00E9, 日 = U+65E5, 𝄞 = U+1D11E (surrogate pair — one codepoint)
    val texts = Seq("héllo", "日本語テキスト断片", "a𝄞b", "mixed é日𝄞 tail")
    val df = texts.toDF("text")
    val fused = df.select($"text", ByteHistogram($"text", 8).as("h"))
    val exploded = df
      .select($"text", posexplode(transform(
        sequence(lit(1), length($"text")),
        i => ascii($"text".substr(i, lit(1))))).as(Seq("pos", "b")))
      .groupBy($"text", ($"pos" % 8).as("dim")).agg(sum($"b").as("v"))
      .groupBy($"text")
      .agg(map_from_arrays(collect_list($"dim"), collect_list($"v")).as("m"))
    val joined = fused.join(exploded, "text").collect()
    // Note: ascii()/length() count UTF-16 units for supplementary chars,
    // so only BMP-only strings are asserted bit-identical; the fused form
    // is codepoint-correct for all of them.
    joined.filter(!_.getString(0).contains("𝄞")).foreach { r =>
      val h = r.getSeq[Long](1)
      val m = r.getMap[Int, Long](2)
      assert(h.indices.forall(d => h(d) == m(d)), s"mismatch on ${r.getString(0)}")
    }
    // supplementary char: fused sums the real codepoint once
    val gClef = fused.where($"text" === "a𝄞b").collect()(0).getSeq[Long](1)
    assert(gClef == Seq(97L, 0x1D11EL, 98L))
  }

  test("parity with the exploded q_media_features formulation on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where($"text".isNotNull && length($"text") > 0)
    val fused = docs.select($"doc_id",
        posexplode(ByteHistogram($"text", 8)).as(Seq("dim", "feature")))
      .select($"doc_id", $"dim".cast("long").as("dim"), $"feature")
    val exploded = docs
      .select($"doc_id", posexplode(transform(
        sequence(lit(1), length($"text")),
        i => ascii($"text".substr(i, lit(1))))).as(Seq("pos", "b")))
      .groupBy($"doc_id", ($"pos" % 8).cast("long").as("dim"))
      .agg(sum($"b").as("feature"))
    assert(fused.exceptAll(exploded).isEmpty && exploded.exceptAll(fused).isEmpty)
    assert(fused.count() > 0)
  }

  test("generated code compiles (CODEGEN_ONLY, no fallback)") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = Seq("abc").toDF("text")
        .select(ByteHistogram($"text", 8)).collect()(0).getSeq[Long](0)
      assert(got == Seq(97L, 98L, 99L))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("rejects non-string input at analysis time") {
    val err = intercept[Exception] {
      Seq(1).toDF("n").select(ByteHistogram($"n", 8)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
