package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // A: hub pointed at by everyone; B/C point at A and each other; D dangles in
  lazy val edges = Seq(
    ("B", "A"), ("C", "A"), ("D", "A"), ("B", "C"), ("C", "B")
  ).toDF("src", "dst")

  private def ranks(iters: Int): Map[String, Long] =
    Graph.pageRankPpm(edges, iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("iteration 0 is the uniform start; nodes cover both endpoints") {
    val r0 = ranks(0)
    assert(r0.keySet == Set("A", "B", "C", "D"))
    assert(r0.values.toSet == Set(1000000L))
  }

  test("hand-computed round 1 matches the integer recurrence exactly") {
    // contrib: B,C have outdeg 2 → 500000 each; D outdeg 1 → 1000000
    // s(A) = 500000+500000+1000000 = 2000000 → r = 150000 + 1700000
    // s(B) = s(C) = 500000 → r = 150000 + 425000; D gets base only
    val r1 = ranks(1)
    assert(r1("A") == 1850000L)
    assert(r1("B") == 575000L)
    assert(r1("C") == 575000L)
    assert(r1("D") == 150000L)
  }

  test("ranking stabilizes with the hub on top and the dangler last") {
    val r3 = ranks(3)
    assert(r3("A") > r3("B") && r3("B") == r3("C") && r3("C") > r3("D"))
  }

  test("result is invariant under input partitioning and edge duplication") {
    val dup = edges.union(edges).repartition(7)
    val a = Graph.pageRankPpm(dup, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == ranks(3))
  }
}
