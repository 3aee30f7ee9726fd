package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  val full = (1L to 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
  val half = full.where(col("doc_id") <= 1000)

  test("hash sample is a deterministic subset, stable under corpus growth") {
    val sHalf = Sampling.hashSample(half, "doc_id", "1a")
      .select("doc_id").as[Long].collect().toSet
    val sFull = Sampling.hashSample(full, "doc_id", "1a")
      .select("doc_id").as[Long].collect().toSet
    assert(sFull.filter(_ <= 1000L) == sHalf) // growth never reshuffles membership
    val frac = sFull.size.toDouble / 2000
    assert(frac > 0.06 && frac < 0.15, s"~10% expected, got $frac")
  }

  test("split assignment is total, disjoint, and stable under growth") {
    val aHalf = Sampling.assignSplit(half, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val aFull = Sampling.assignSplit(full, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(aFull.size == 2000 && aFull.values.toSet == Set("train", "val", "test"))
    assert(aFull.filter(_._1 <= 1000L) == aHalf)
    val train = aFull.values.count(_ == "train").toDouble / 2000
    assert(train > 0.74 && train < 0.85, s"~80% train expected, got $train")
  }
}
