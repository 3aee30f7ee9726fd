package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key carrying 90% of rows
  lazy val skewed = (1 to 900).map(i => ("hot", i % 37)) ++
    (1 to 100).map(i => (s"cold${i % 10}", i))

  test("salted distinct-count equals plain countDistinct") {
    val df = skewed.toDF("k", "v")
    val salted = Skew.saltedCountDistinct(df, $"k", $"v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = df.groupBy("k").agg(countDistinct($"v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 37)
  }

  test("salted collect_set equals plain collect_set") {
    val df = skewed.toDF("k", "v")
    val salted = Skew.saltedCollectSet(df, $"k", $"v")
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toSet).toMap
    val plain = df.groupBy("k").agg(collect_set($"v").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toSet).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val left = skewed.toDF("k", "v")
    val right = (Seq("hot") ++ (0 to 9).map(i => s"cold$i")).zipWithIndex.toDF("k", "w")
    val salted = Skew.saltedJoin(left, right, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = left.join(right, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
