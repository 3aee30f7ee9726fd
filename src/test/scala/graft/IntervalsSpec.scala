package graft

import graft.ops.Intervals
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def merge(rows: Seq[(String, Long, Long, Long)]) =
    Intervals.coalesce(rows.toDF("k", "s", "e", "id"), "k", "s", "e", "id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

  test("overlapping intervals collapse into one island") {
    assert(merge(Seq(("k", 0L, 10L, 1L), ("k", 5L, 20L, 2L), ("k", 15L, 25L, 3L)))
      == Set(("k", 1L, 0L, 25L, 3L)))
  }

  test("a contained interval extends nothing but must not split the island") {
    // [10,20] ends before [0,100]; the NEXT interval [30,40] still overlaps
    // the running max (100) — a lag(end)-based rule would wrongly split here
    val out = merge(Seq(("k", 0L, 100L, 1L), ("k", 10L, 20L, 2L),
      ("k", 30L, 40L, 3L), ("k", 150L, 160L, 4L)))
    assert(out == Set(("k", 1L, 0L, 100L, 3L), ("k", 2L, 150L, 160L, 1L)))
  }

  test("touching bounds merge (inclusive ends) and a gap of 1 does not") {
    assert(merge(Seq(("k", 0L, 10L, 1L), ("k", 10L, 20L, 2L)))
      == Set(("k", 1L, 0L, 20L, 2L)))
    assert(merge(Seq(("k", 0L, 10L, 1L), ("k", 11L, 20L, 2L)))
      == Set(("k", 1L, 0L, 10L, 1L), ("k", 2L, 11L, 20L, 1L)))
  }

  test("keys are independent and islands number 1..k in time order") {
    val out = merge(Seq(("a", 0L, 5L, 1L), ("a", 20L, 30L, 2L),
      ("b", 0L, 100L, 3L)))
    assert(out == Set(("a", 1L, 0L, 5L, 1L), ("a", 2L, 20L, 30L, 1L),
      ("b", 1L, 0L, 100L, 1L)))
  }

  test("time-sharded form is bit-identical to the single window") {
    // 400 intervals per key over two keys, alternating long overlappers
    // and short gapped ones so islands repeatedly open, extend through
    // containment, and close across shard boundaries
    val rows = for {
      k <- Seq("hot", "cold")
      i <- 0L until 400L
    } yield {
      val base = i * 10
      if (i % 3 == 0) (k, base, base + 25, i) // overlaps the next two
      else if (i % 3 == 1) (k, base, base + 3, i) // contained
      else (k, base + 7, base + 8, i) // contained in the %3==0 umbrella
    }
    val df = rows.toDF("k", "s", "e", "id")
    val single = merge(rows)
    for (shards <- Seq(2, 7, 32, 1000)) {
      val sharded = Intervals.coalesce(df, "k", "s", "e", "id", timeShards = shards)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .toSet
      assert(sharded == single, s"timeShards=$shards diverged")
    }
  }

  test("sharded form handles an island spanning every shard") {
    // one umbrella interval covers the whole timeline; every later
    // interval continues island 1 no matter which shard it lands in
    val rows = ("k", 0L, 10000L, 0L) +:
      (1L until 100L).map(i => ("k", i * 100, i * 100 + 1, i))
    val out = Intervals.coalesce(rows.toDF("k", "s", "e", "id"),
      "k", "s", "e", "id", timeShards = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(out == Set(("k", 1L, 0L, 10000L, 100L)))
  }

  test("result is invariant under input partitioning") {
    val rows = (0L until 200L).map(i => ("k", i * 7 % 500, i * 7 % 500 + 10, i))
    val base = merge(rows)
    val shuffled = Intervals.coalesce(
      scala.util.Random.shuffle(rows).toDF("k", "s", "e", "id").repartition(13),
      "k", "s", "e", "id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(shuffled == base)
  }
}
