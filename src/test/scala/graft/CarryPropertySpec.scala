package graft

import graft.ops.{Scd2, Sessionize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: for ANY generated per-key timeline (ties, exact-gap edges,
  * clumps, singletons) and ANY shard count, the carry-lifted time-sharded
  * forms of sessionization and SCD2 are bit-identical to their
  * single-window references — numbering and version continuation
  * included. The fixed-fixture cases live in SessionizeSpec/Scd2Spec;
  * this spec walks the input space.
  */
class CarryPropertySpec extends SparkSpec {
  import spark.implicits._

  private val GAP = 50L

  private def check(n: Int)(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // per-key timelines: steps drawn to land on ties (0), the exact gap
  // boundary (GAP / GAP+1), and clumpy spreads; a few keys, short lists
  // (the window reference is O(n log n) per key — properties need many
  // runs more than big runs)
  private val timelineGen: Gen[Seq[(Long, Long, Long)]] = for {
    nKeys <- Gen.choose(1, 5)
    rows <- Gen.sequence[Seq[Seq[(Long, Long, Long)]], Seq[(Long, Long, Long)]](
      (1 to nKeys).map { k =>
        for {
          n <- Gen.choose(1, 30)
          steps <- Gen.listOfN(n,
            Gen.frequency(2 -> Gen.const(0L), 2 -> Gen.const(GAP),
              2 -> Gen.const(GAP + 1), 4 -> Gen.choose(1L, 3 * GAP)))
        } yield {
          var t = 100L
          steps.zipWithIndex.map { case (s, i) =>
            t += s
            (k.toLong * 10000 + i, k.toLong, t)
          }
        }
      })
  } yield rows.flatten

  private def df(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("event_id", "user_id", "ts").repartition(5)

  private def sessRef(ev: DataFrame): Set[(Long, Long, Long, Long, Long)] = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > GAP, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"), min(col("ts")).as("s"), max(col("ts")).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
  }

  test("sessionize: sharded == window reference on random timelines") {
    check(30)(Prop.forAll(timelineGen, Gen.oneOf(2, 3, 7, 16)) { (rows, shards) =>
      val ev = df(rows)
      val ref = sessRef(ev)
      val got = Sessionize.viaIntervals(ev, "user_id", "ts", "event_id",
          GAP, timeShards = shards)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      if (got != ref)
        println(s"MISMATCH shards=$shards rows=$rows\nref=$ref\ngot=$got")
      got == ref
    })
  }

  private def canonScd2(d: DataFrame): Set[(Long, Long, Long, Option[Long], Long, Boolean)] =
    d.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4), r.getBoolean(5))
    }.toSet

  test("scd2: sharded build == window reference on random histories") {
    check(30)(Prop.forAll(timelineGen, Gen.oneOf(2, 3, 7, 16)) { (rows, shards) =>
      val v = df(rows)
      val ref = canonScd2(Scd2.build(v))
      val got = canonScd2(Scd2.build(v, timeShards = shards))
      if (got != ref)
        println(s"MISMATCH shards=$shards rows=$rows\nref=$ref\ngot=$got")
      got == ref
    })
  }

  // true intervals (not equal-length leases): independent lengths with a
  // heavy containment mix — the case where the running-MAX carry differs
  // from a lag(end) carry, and the one the lease-based properties above
  // cannot reach
  private val intervalGen: Gen[Seq[(Long, Long, Long, Long)]] = for {
    nKeys <- Gen.choose(1, 4)
    rows <- Gen.sequence[Seq[Seq[(Long, Long, Long, Long)]], Seq[(Long, Long, Long, Long)]](
      (1 to nKeys).map { k =>
        for {
          n <- Gen.choose(1, 25)
          ivs <- Gen.listOfN(n, for {
            s <- Gen.choose(0L, 500L)
            len <- Gen.frequency(3 -> Gen.choose(0L, 30L),
              1 -> Gen.choose(100L, 400L)) // long ones contain later starts
          } yield (s, s + len))
        } yield ivs.zipWithIndex.map { case ((s, e), i) =>
          (k.toLong * 10000 + i, k.toLong, s, e)
        }
      })
  } yield rows.flatten

  private def canonIv(d: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("intervals: sharded coalesce == single-window on random containment-heavy sets") {
    check(30)(Prop.forAll(intervalGen, Gen.oneOf(2, 3, 7, 16)) { (rows, shards) =>
      val iv = rows.toDF("event_id", "user_id", "s", "e").repartition(5)
      val ref = canonIv(graft.ops.Intervals
        .coalesce(iv, "user_id", "s", "e", "event_id"))
      val got = canonIv(graft.ops.Intervals
        .coalesce(iv, "user_id", "s", "e", "event_id", timeShards = shards))
      if (got != ref)
        println(s"MISMATCH shards=$shards rows=$rows\nref=$ref\ngot=$got")
      got == ref
    })
  }
}
