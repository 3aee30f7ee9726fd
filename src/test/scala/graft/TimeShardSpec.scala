package graft

import graft.ops.TimeShard
import org.apache.spark.sql.functions._

/** Unit + plan contracts of the shared shard machinery — the properties
  * CarryPropertySpec proves end-to-end, pinned at the expression/plan
  * level so a refactor that breaks one fails HERE with the mechanism
  * named.
  */
class TimeShardSpec extends SparkSpec {
  import spark.implicits._

  test("assign: NULL ts takes shard -1; assignment is monotone; equal ts share a shard") {
    val rows = Seq[(java.lang.Long, Long, Long)](
      (null, 0L, 100L), (0L, 0L, 100L), (50L, 0L, 100L), (50L, 0L, 100L),
      (99L, 0L, 100L), (100L, 0L, 100L)
    ).toDF("ts", "lo", "hi")
    val got = rows.select(TimeShard.assign(col("ts"),
        col("lo").cast("double"), col("hi").cast("double"), lit(4)).as("sh"))
      .collect().map(r => r.getInt(0)).toSeq
    assert(got.head == -1, "NULL ts must take the dedicated FIRST shard")
    assert(got.tail == got.tail.sorted, s"assignment must be monotone in ts: $got")
    assert(got(2) == got(3), "equal timestamps must share a shard")
    assert(got.last == 3, "ts == hi lands in the last shard, never past it")
    // degenerate range (lo == hi): everything in shard 0
    val flat = Seq((5L, 5L, 5L)).toDF("ts", "lo", "hi")
      .select(TimeShard.assign(col("ts"), col("lo").cast("double"),
        col("hi").cast("double"), lit(8)).as("sh")).collect()(0).getInt(0)
    assert(flat == 0)
  }

  test("hybrid rejects reserved column names with the actual story") {
    val df = Seq((1L, 2L)).toDF("k", "_sh")
    val e = intercept[IllegalArgumentException] {
      TimeShard.hybrid(df, "k", col("_sh"), 4, 0L)(identity)(identity)
    }
    assert(e.getMessage.contains("_sh"))
  }

  test("auto plan: hot bounds broadcast; the cold corpus never shuffles for the split") {
    // 1 hot key (40 rows) + 50 cold keys (2 rows each)
    val rows = (1 to 40).map(i => (0L, i.toLong)) ++
      (1 to 50).flatMap(k => Seq((k.toLong, 1L), (k.toLong, 2L)))
    val df = rows.toDF("k", "ts").repartition(4)
    val out = graft.ops.Intervals.coalesce(
      df.withColumn("e", col("ts") + 1).withColumn("tie", col("ts")),
      "k", "ts", "e", "tie", timeShards = 4, autoThreshold = 10L)
    out.collect() // finalize the adaptive plan
    val plan = out.queryExecution.executedPlan.toString
    // the hot-bounds split joins by BROADCAST (the counted gate passed):
    // a shuffle or sort-merge join here would re-shuffle the cold corpus
    // just to learn it is cold
    assert(plan.contains("BroadcastHashJoin"),
      s"hot-bounds split must broadcast:\n${plan.take(3000)}")
    // the sharded side keeps its explicit (key, shard) exchange
    assert(plan.contains("_sh"), "shard column missing from the plan")
  }

  test("collectGate: past the gate the split degrades to an in-plan join, results unchanged") {
    // 2 hot keys (40 rows each) + 20 cold keys (2 rows each); threshold 10
    // splits them. collectGate = 1 < 2 hot keys forces the degraded path.
    val rows = (1 to 40).flatMap(i => Seq((0L, i.toLong), (1L, i.toLong))) ++
      (1 to 20).flatMap(k => Seq((k + 1L, 1L), (k + 1L, 2L)))
    val df = rows.toDF("k", "ts").repartition(4)
    def run(gate: Long) = graft.ops.TimeShard.hybrid(df, "k", col("ts"), 4, 10L,
      collectGate = gate) { base =>
      base.groupBy("k").agg(count(lit(1)).as("n"))
    } { assigned =>
      assigned.repartition(col("k"), col("_sh"))
        .groupBy("k", "_sh").agg(count(lit(1)).as("n"))
        .groupBy("k").agg(sum("n").as("n"))
    }
    val expected = run(graft.ops.TimeShard.DefaultCollectGate)
    val degraded = run(1L)
    expected.collect()
    degraded.collect()
    // the COLLECTED bounds surface as a LocalTableScan with the bounds
    // schema (key renamed _ck first) — the fixture's own toDF local scan
    // doesn't match this signature
    val boundsScan = "LocalTableScan [_ck"
    // under the gate: the hot bounds collect into a broadcast LOCAL
    // relation (the rows already crossed the driver for the decision)
    assert(expected.queryExecution.executedPlan.toString.contains(boundsScan),
      "under-gate split must join the COLLECTED bounds as a local relation")
    // past the gate: no driver materialization — the hot-bounds filter
    // re-enters the plan and the planner picks the join
    assert(!degraded.queryExecution.executedPlan.toString.contains(boundsScan),
      "past-gate split must never collect the bounds into the driver")
    val a = expected.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = degraded.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b, "the degraded path must be result-identical")
    val e = intercept[IllegalArgumentException] {
      graft.ops.TimeShard.hybrid(df, "k", col("ts"), 4, 10L,
        collectGate = -1L)(identity)(identity)
    }
    assert(e.getMessage.contains("collectGate"))
  }

  test("manual plan: the full bounds table joins by shuffle hash, not sort-merge") {
    val df = (1 to 100).map(i => ((i % 10).toLong, i.toLong)).toDF("k", "ts")
      .withColumn("e", col("ts") + 1).withColumn("tie", col("ts"))
    val out = graft.ops.Intervals.coalesce(df, "k", "ts", "e", "tie",
      timeShards = 4)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // a sort-merge bounds join would re-sort the hot key's partition —
    // the funnel the escape exists to break
    assert(!plan.contains("SortMergeJoin"),
      s"bounds/carry joins must not sort-merge:\n${plan.take(3000)}")
  }
}
