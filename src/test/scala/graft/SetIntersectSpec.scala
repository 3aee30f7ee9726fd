package graft

import graft.functions.SortedIntersectCount
import org.apache.spark.sql.functions._

/** [[graft.functions.SortedIntersectCount]] — the set-similarity verify
  * kernel: merge-loop intersection count over two sorted, distinct,
  * null-free string arrays.
  */
class SetIntersectSpec extends SparkSpec {
  import spark.implicits._

  private def count(a: Seq[String], b: Seq[String]): Option[Int] = {
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(SortedIntersectCount(
      sort_array($"a"), sort_array($"b")).as("c")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  test("counts common elements of sorted sets") {
    assert(count(Seq("a", "b", "c"), Seq("b", "c", "d")) == Some(2))
    assert(count(Seq("a"), Seq("a")) == Some(1))
    assert(count(Seq("a", "b"), Seq("c", "d")) == Some(0))
    assert(count(Seq(), Seq("a")) == Some(0))
  }

  test("matches size(array_intersect) on generated distinct sets") {
    val docs = (1 to 200).map { i =>
      val a = (0 until 30).map(j => s"w${(i * 7 + j * 13) % 97}").distinct
      val b = (0 until 30).map(j => s"w${(i * 11 + j * 5) % 97}").distinct
      (a, b)
    }
    val df = docs.toDF("a", "b")
    val mismatches = df.select(
        SortedIntersectCount(sort_array($"a"), sort_array($"b")).as("fast"),
        size(array_intersect($"a", $"b")).as("ref"))
      .where($"fast" =!= $"ref").count()
    assert(mismatches == 0L)
  }

  test("null array yields null") {
    val df = Seq((Seq("a"), null: Seq[String])).toDF("a", "b")
    val r = df.select(SortedIntersectCount($"a", $"b").as("c")).collect()(0)
    assert(r.isNullAt(0))
  }
}
