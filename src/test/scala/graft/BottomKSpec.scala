package graft

import graft.functions.BottomKDistinct
import org.apache.spark.sql.functions._

class BottomKSpec extends SparkSpec {
  import spark.implicits._

  test("keeps the k smallest DISTINCT values, ascending, across partitions") {
    val df = spark.sparkContext
      .parallelize(Seq(9L, 5L, 7L, 5L, 1L, 3L, 9L, 2L, 8L, 1L, 6L), 4)
      .toDF("v")
    val got = df.agg(BottomKDistinct(col("v"), 4).as("ks"))
      .select(col("ks")).collect()(0).getSeq[Long](0)
    assert(got == Seq(1L, 2L, 3L, 5L))
  }

  test("fewer distinct values than k yields them all; nulls are ignored") {
    val df = Seq(Some(4L), None, Some(2L), Some(4L), None).toDF("v")
    val got = df.agg(BottomKDistinct(col("v"), 64).as("ks"))
      .select(col("ks")).collect()(0).getSeq[Long](0)
    assert(got == Seq(2L, 4L))
  }

  test("grouped sketches stay per-group and bounded") {
    val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L), ("b", 9L))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(BottomKDistinct(col("v"), 2).as("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(1L, 2L) && got("b") == Seq(9L))
  }

  test("matches distinct+sort+limit semantics on random input") {
    val rnd = new scala.util.Random(5)
    val vals = Seq.fill(3000)(rnd.nextInt(400).toLong)
    val df = spark.sparkContext.parallelize(vals, 8).toDF("v")
    val got = df.agg(BottomKDistinct(col("v"), 64).as("ks"))
      .select(col("ks")).collect()(0).getSeq[Long](0)
    val want = vals.distinct.sorted.take(64)
    assert(got == want)
  }
}
