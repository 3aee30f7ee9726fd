package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** [[TrainingQueries.bloomDecontam]] on planted corpora: one-sided
  * guarantee (never misses real contamination), benchmark self-hits, and
  * the false-positive branch forced with an undersized 1-hex-char filter
  * — branches the driver fixture can't reach (it has no 8-gram
  * contamination among doc_id >= 5 and its bench grams can't fill a
  * 2^16-slot block).
  */
class BloomDecontamSpec extends SparkSpec {
  import spark.implicits._

  test("flags planted contamination and benchmark self-hits, not clean docs") {
    val docs = Seq(
      (0L, "alpha bravo charlie delta echo foxtrot golf hotel india"),
      (10L, "xray alpha bravo charlie delta echo foxtrot golf hotel"),
      (11L, "one two three four five six seven eight nine")
    ).toDF("doc_id", "text")
    val got = TrainingQueries.bloomDecontam(docs, benchBelow = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bench doc: both of its own 8-grams self-hit
    assert(got(0L) == 2L)
    // contaminated doc: exactly its shared gram ("alpha..hotel"); the
    // non-shared gram's positions miss a 2-gram filter (3 independent
    // 16-bit blocks — verified deterministic, md5 is fixed)
    assert(got(10L) == 1L)
    // clean doc: not flagged at all
    assert(!got.contains(11L))
  }

  test("undersized filter: superset of exact hits, with false positives") {
    // 5 bench docs + 60 corpus docs over a 97-word vocab; strides make
    // overlapping windows so some corpus docs share real 8-grams with the
    // bench and most don't.
    val docs = (0 until 65).map { i =>
      val id = if (i < 5) i.toLong else (i + 5).toLong
      val toks = (0 until 15).map(j => s"w${(i * 31 + j * 7) % 97}")
      (id, toks.mkString(" "))
    }.toDF("doc_id", "text")

    val sh = Dedup.shingles(docs, 8)
    val bench = sh.where($"doc_id" < 5).select("shingle").distinct()
    val exact = sh.where($"doc_id" >= 5)
      .join(broadcast(bench), Seq("shingle"), "left_semi")
      .select("doc_id", "shingle").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_exact"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val bloom = TrainingQueries.bloomDecontam(docs, benchBelow = 5, hexChars = 1)
      .where($"doc_id" >= 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // one-sided: every exactly-contaminated doc is bloom-flagged with at
    // least as many gram hits
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id) && bloom(id) >= n,
        s"doc $id: exact=$n bloom=${bloom.get(id)}")
    }
    // undersized blocks (16 slots each) must also produce false positives
    assert(bloom.values.sum > exact.values.sum)
    assert(bloom.keySet.size > exact.keySet.size)
  }

  test("rejects out-of-range block widths") {
    val docs = Seq((0L, "a b c d e f g h")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      TrainingQueries.bloomDecontam(docs, benchBelow = 5, hexChars = 9)
    }
    assert(err.getMessage.contains("hex chars"))
  }
}
