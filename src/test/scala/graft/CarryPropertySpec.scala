package graft

import graft.ops.{AsOfJoin, Funnel, Scd2, Sessionize}
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

  // NULL primary sort keys — the shardedCum lesson (round 8) applied to
  // the carry escapes: a NULL ts takes the NULL shard, which sorts FIRST
  // in the shard-order windows exactly as NULL ts sorts first in the
  // single window's ORDER BY, so the sharded forms must reproduce the
  // window reference bit-for-bit, NULLs included. Fixed adversarial
  // shapes (NULLs mixed into a real timeline; an all-NULL entity) rather
  // than generator noise: the cases are about the NULL shard's ordering
  // and carries, not the input distribution.
  private def canonScd2N(d: DataFrame): Set[(Long, Long, Option[Long], Option[Long], Long, Boolean)] =
    d.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4), r.getBoolean(5))
    }.toSet

  test("scd2: sharded build == window reference with NULL timestamps") {
    val rows: Seq[(Long, Long, java.lang.Long)] = Seq(
      // u1: two NULL-ts versions (tie key orders them) + a real history
      (1L, 1L, null), (2L, 1L, null), (3L, 1L, java.lang.Long.valueOf(100L)),
      (4L, 1L, java.lang.Long.valueOf(250L)), (5L, 1L, java.lang.Long.valueOf(250L)),
      (6L, 1L, java.lang.Long.valueOf(900L)),
      // u2: every version NULL-ts
      (7L, 2L, null), (8L, 2L, null), (9L, 2L, null),
      // u3: single real version (control)
      (10L, 3L, java.lang.Long.valueOf(5L)))
    val v = rows.toDF("event_id", "user_id", "ts").repartition(4)
    val ref = canonScd2N(Scd2.build(v))
    for (shards <- Seq(2, 3, 7)) {
      val got = canonScd2N(Scd2.build(v, timeShards = shards))
      assert(got == ref, s"shards=$shards\nref=$ref\ngot=$got")
    }
  }

  // randomized NULL injection over the same timeline space: the fixed
  // cases above pin the mechanism (NULL shard first, positional carry);
  // this walks NULL × tie × shard-boundary interactions the fixed shapes
  // can't enumerate
  test("scd2: sharded == window reference with randomly NULLed timestamps") {
    check(20)(Prop.forAll(timelineGen, Gen.oneOf(2, 3, 7, 16),
        Gen.choose(0L, Long.MaxValue)) { (rows, shards, seed) =>
      val rnd = new scala.util.Random(seed)
      val withNulls = rows.map { case (e, k, t) =>
        (e, k, if (rnd.nextInt(6) == 0) null
               else java.lang.Long.valueOf(t): java.lang.Long)
      }
      val v = withNulls.toDF("event_id", "user_id", "ts").repartition(5)
      val ref = canonScd2N(Scd2.build(v))
      val got = canonScd2N(Scd2.build(v, timeShards = shards))
      if (got != ref)
        println(s"MISMATCH shards=$shards rows=$withNulls\nref=$ref\ngot=$got")
      got == ref
    })
  }

  test("intervals: sharded == single-window with randomly NULLed bounds") {
    check(20)(Prop.forAll(intervalGen, Gen.oneOf(2, 3, 7, 16),
        Gen.choose(0L, Long.MaxValue)) { (rows, shards, seed) =>
      val rnd = new scala.util.Random(seed)
      val withNulls = rows.map { case (e, k, s0, e0) =>
        (e, k,
          if (rnd.nextInt(6) == 0) null else java.lang.Long.valueOf(s0): java.lang.Long,
          if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(e0): java.lang.Long)
      }
      val iv = withNulls.toDF("event_id", "user_id", "s", "e").repartition(5)
      val ref = canonIvN(graft.ops.Intervals
        .coalesce(iv, "user_id", "s", "e", "event_id"))
      val got = canonIvN(graft.ops.Intervals
        .coalesce(iv, "user_id", "s", "e", "event_id", timeShards = shards))
      if (got != ref)
        println(s"MISMATCH shards=$shards rows=$withNulls\nref=$ref\ngot=$got")
      got == ref
    })
  }

  private def canonIvN(d: DataFrame): Set[(Long, Long, Option[Long], Option[Long], Long)] =
    d.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4))
    }.toSet

  // the sharded as-of join under randomized NULL injection on BOTH
  // spines (round-10 verdict #3: its NULL coverage was fixed-case only
  // while the other three escapes had this property) — left rows with
  // NULL ts sort first and must see exactly the NULL-ts right rows the
  // single window shows them, across every shard count and threshold
  private def asofCanon(d: DataFrame): Set[(Long, Long, Option[Long], Option[Long], Option[Long])] =
    d.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSet

  test("asof: sharded == single-window with randomly NULLed timestamps") {
    check(20)(Prop.forAll(timelineGen, timelineGen, Gen.oneOf(2, 8, 32),
        Gen.choose(0L, Long.MaxValue)) { (lrows, rrows, shards, seed) =>
      val rnd = new scala.util.Random(seed)
      def nullify(t: Long): java.lang.Long =
        if (rnd.nextInt(6) == 0) null else java.lang.Long.valueOf(t)
      val l = lrows.map { case (e, k, t) => (e, k, nullify(t)) }
        .toDF("event_id", "user_id", "ts").repartition(5)
      val r = rrows.map { case (e, k, t) => (e + 500000L, k, nullify(t), e * 3L) }
        .toDF("o_id", "o_user", "ots", "price").repartition(5)
      def run(sh: Int, auto: Long) = asofCanon(AsOfJoin.asOf(
        l, r, "user_id", "o_user", "ts", "ots", Seq("o_id", "price"),
        tieBreak = "o_id", joinType = "left", timeShards = sh,
        autoThreshold = auto))
      val ref = run(1, 0L)
      val manual = run(shards, 0L)
      val auto = run(shards, 12L)
      if (manual != ref || auto != ref)
        println(s"MISMATCH shards=$shards l=$lrows r=$rrows")
      manual == ref && auto == ref
    })
  }

  // the data-driven hybrid (autoThreshold > 0): cold keys ride the
  // single window, hot keys the carry path, outputs union — must equal
  // both pure forms on mixed corpora, NULLs included. Thresholds are
  // drawn to land on all three regimes: 0-ish (everything shards),
  // mid (a genuine mix at the 1-30 rows/key generator range), and
  // above-max (nothing shards — the union with an empty hot side).
  private val autoThresholdGen: Gen[Long] = Gen.oneOf(1L, 5L, 15L, 40L)

  test("scd2: auto-threshold hybrid == manual == single-window (random NULLs)") {
    check(20)(Prop.forAll(timelineGen, Gen.oneOf(2, 3, 7, 16), autoThresholdGen,
        Gen.choose(0L, Long.MaxValue)) { (rows, shards, thr, seed) =>
      val rnd = new scala.util.Random(seed)
      val withNulls = rows.map { case (e, k, t) =>
        (e, k, if (rnd.nextInt(6) == 0) null
               else java.lang.Long.valueOf(t): java.lang.Long)
      }
      val v = withNulls.toDF("event_id", "user_id", "ts").repartition(5)
      val ref = canonScd2N(Scd2.build(v))
      val got = canonScd2N(Scd2.build(v, timeShards = shards, autoThreshold = thr))
      if (got != ref)
        println(s"MISMATCH shards=$shards thr=$thr rows=$withNulls\nref=$ref\ngot=$got")
      got == ref
    })
  }

  test("sessionize: auto-threshold hybrid == single-window on random timelines") {
    check(20)(Prop.forAll(timelineGen, Gen.oneOf(2, 3, 16), autoThresholdGen) {
      (rows, shards, thr) =>
        val ev = df(rows)
        val ref = sessRef(ev)
        val got = Sessionize.viaIntervals(ev, "user_id", "ts", "event_id",
            GAP, timeShards = shards, autoThreshold = thr)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toSet
        if (got != ref)
          println(s"MISMATCH shards=$shards thr=$thr rows=$rows\nref=$ref\ngot=$got")
        got == ref
    })
  }

  test("intervals: auto-threshold hybrid == single-window (random NULLs, containment-heavy)") {
    check(20)(Prop.forAll(intervalGen, Gen.oneOf(2, 3, 16), autoThresholdGen,
        Gen.choose(0L, Long.MaxValue)) { (rows, shards, thr, seed) =>
      val rnd = new scala.util.Random(seed)
      val withNulls = rows.map { case (e, k, s0, e0) =>
        (e, k,
          if (rnd.nextInt(6) == 0) null else java.lang.Long.valueOf(s0): java.lang.Long,
          if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(e0): java.lang.Long)
      }
      val iv = withNulls.toDF("event_id", "user_id", "s", "e").repartition(5)
      val ref = canonIvN(graft.ops.Intervals
        .coalesce(iv, "user_id", "s", "e", "event_id"))
      val got = canonIvN(graft.ops.Intervals
        .coalesce(iv, "user_id", "s", "e", "event_id", timeShards = shards,
          autoThreshold = thr))
      if (got != ref)
        println(s"MISMATCH shards=$shards thr=$thr rows=$withNulls\nref=$ref\ngot=$got")
      got == ref
    })
  }

  // NULL KEYS (round 11): Window.partitionBy treats NULL as one ordinary
  // group, but the sharded paths' original USING equi-joins dropped
  // NULL-key rows — found while centralising the joins in TimeShard,
  // fixed with null-safe (<=>) key matching. These properties plant
  // whole NULL-key timelines (with NULL timestamps mixed in) and require
  // the sharded AND auto forms to reproduce the single-window reference,
  // including the NULL group's carries and numbering.
  // Scd2.build output order: (user_id nullable, event_id, valid_from,
  // valid_to, version, is_current)
  private def canonScd2K(d: DataFrame): Set[(Option[Long], Long, Option[Long], Option[Long], Long, Boolean)] =
    d.collect().map { r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4), r.getBoolean(5))
    }.toSet

  test("scd2: sharded + auto keep NULL-KEY groups (random NULL keys and timestamps)") {
    check(15)(Prop.forAll(timelineGen, Gen.oneOf(2, 3, 16),
        Gen.choose(0L, Long.MaxValue)) { (rows, shards, seed) =>
      val rnd = new scala.util.Random(seed)
      val nullKeys = rows.map(_._2).distinct.filter(_ => rnd.nextInt(3) == 0).toSet
      val v = rows.map { case (e, k, t) =>
        (e,
          if (nullKeys(k)) null else java.lang.Long.valueOf(k): java.lang.Long,
          if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(t): java.lang.Long)
      }.toDF("event_id", "user_id", "ts")
        .select(col("user_id"), col("event_id"), col("ts")).repartition(5)
      val ref = canonScd2K(Scd2.build(v))
      val manual = canonScd2K(Scd2.build(v, timeShards = shards))
      val auto = canonScd2K(Scd2.build(v, timeShards = shards, autoThreshold = 12L))
      if (manual != ref || auto != ref)
        println(s"MISMATCH shards=$shards nullKeys=$nullKeys\nref=$ref\nmanual=$manual\nauto=$auto")
      manual == ref && auto == ref
    })
  }

  private def canonIvK(d: DataFrame): Set[(Option[Long], Long, Option[Long], Option[Long], Long)] =
    d.collect().map { r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4))
    }.toSet

  test("intervals: sharded + auto keep NULL-KEY groups (random NULL keys and bounds)") {
    check(15)(Prop.forAll(intervalGen, Gen.oneOf(2, 3, 16),
        Gen.choose(0L, Long.MaxValue)) { (rows, shards, seed) =>
      val rnd = new scala.util.Random(seed)
      val nullKeys = rows.map(_._2).distinct.filter(_ => rnd.nextInt(3) == 0).toSet
      val iv = rows.map { case (e, k, s0, e0) =>
        (e,
          if (nullKeys(k)) null else java.lang.Long.valueOf(k): java.lang.Long,
          if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(s0): java.lang.Long,
          if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(e0): java.lang.Long)
      }.toDF("event_id", "user_id", "s", "e").repartition(5)
      val ref = canonIvK(graft.ops.Intervals
        .coalesce(iv, "user_id", "s", "e", "event_id")
        .select("user_id", "island", "s", "e", "n_rows"))
      def got(thr: Long) = canonIvK(graft.ops.Intervals
        .coalesce(iv, "user_id", "s", "e", "event_id", timeShards = shards,
          autoThreshold = thr)
        .select("user_id", "island", "s", "e", "n_rows"))
      val (manual, auto) = (got(0L), got(12L))
      if (manual != ref || auto != ref)
        println(s"MISMATCH shards=$shards nullKeys=$nullKeys\nref=$ref\nmanual=$manual\nauto=$auto")
      manual == ref && auto == ref
    })
  }

  private def asofCanonK(d: DataFrame): Set[(Long, Option[Long], Option[Long], Option[Long], Option[Long])] =
    d.collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSet

  test("asof: sharded + auto keep NULL-KEY groups on both spines") {
    check(15)(Prop.forAll(timelineGen, timelineGen, Gen.oneOf(2, 8, 32),
        Gen.choose(0L, Long.MaxValue)) { (lrows, rrows, shards, seed) =>
      val rnd = new scala.util.Random(seed)
      val nullKeys = (lrows.map(_._2) ++ rrows.map(_._2)).distinct
        .filter(_ => rnd.nextInt(3) == 0).toSet
      def key(k: Long): java.lang.Long =
        if (nullKeys(k)) null else java.lang.Long.valueOf(k)
      def ts(t: Long): java.lang.Long =
        if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(t)
      val l = lrows.map { case (e, k, t) => (e, key(k), ts(t)) }
        .toDF("event_id", "user_id", "ts").repartition(5)
      val r = rrows.map { case (e, k, t) => (e + 500000L, key(k), ts(t), e * 3L) }
        .toDF("o_id", "o_user", "ots", "price").repartition(5)
      def run(sh: Int, auto: Long) = asofCanonK(AsOfJoin.asOf(
        l, r, "user_id", "o_user", "ts", "ots", Seq("o_id", "price"),
        tieBreak = "o_id", joinType = "left", timeShards = sh,
        autoThreshold = auto))
      val ref = run(1, 0L)
      val manual = run(shards, 0L)
      val auto = run(shards, 12L)
      if (manual != ref || auto != ref)
        println(s"MISMATCH shards=$shards nullKeys=$nullKeys")
      manual == ref && auto == ref
    })
  }

  // the funnel's threshold-join escape (round 13): the per-key stage
  // thresholds replicate per (key, shard) instead of carrying running
  // state, so the property is exact equality of the per-key first-time
  // vectors across single / manual / auto — NULL keys stay one ordinary
  // group (null-safe joins) and NULL timestamps never satisfy a strict
  // threshold nor win a min, exactly as in the single form
  private def funnelCanon(d: DataFrame): Set[(Option[Long], Option[Long], Option[Long], Option[Long])] =
    d.collect().map { r =>
      def g(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (g(0), g(1), g(2), g(3))
    }.toSet

  test("funnel: sharded + auto == single with random NULL keys and timestamps") {
    check(15)(Prop.forAll(timelineGen, Gen.oneOf(2, 3, 16),
        Gen.choose(0L, Long.MaxValue)) { (rows, shards, seed) =>
      val rnd = new scala.util.Random(seed)
      val types = Array("view", "click", "purchase", "noise")
      val nullKeys = rows.map(_._2).distinct.filter(_ => rnd.nextInt(3) == 0).toSet
      val ev = rows.map { case (e, k, t) =>
        (e,
          if (nullKeys(k)) null else java.lang.Long.valueOf(k): java.lang.Long,
          if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(t): java.lang.Long,
          types(rnd.nextInt(types.length)))
      }.toDF("event_id", "user_id", "ts", "event_type").repartition(5)
      def run(sh: Int, thr: Long) = funnelCanon(Funnel.firstTimes(
        ev, "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        timeShards = sh, autoThreshold = thr))
      val ref = run(1, 0L)
      val manual = run(shards, 0L)
      val auto = run(shards, 12L)
      if (manual != ref || auto != ref)
        println(s"MISMATCH shards=$shards nullKeys=$nullKeys rows=$rows\n" +
          s"ref=$ref\nmanual=$manual\nauto=$auto")
      manual == ref && auto == ref
    })
  }

  test("intervals: sharded coalesce == single-window with NULL starts") {
    val rows: Seq[(Long, Long, java.lang.Long, java.lang.Long)] = Seq(
      // k1: NULL-start rows (one with a real end that should seed the
      // running max for everything after, one fully NULL) + real islands
      (1L, 1L, null, java.lang.Long.valueOf(120L)), (2L, 1L, null, null),
      (3L, 1L, java.lang.Long.valueOf(100L), java.lang.Long.valueOf(110L)),
      (4L, 1L, java.lang.Long.valueOf(130L), java.lang.Long.valueOf(140L)),
      (5L, 1L, java.lang.Long.valueOf(500L), java.lang.Long.valueOf(600L)),
      // k2: all-NULL starts
      (6L, 2L, null, null), (7L, 2L, null, java.lang.Long.valueOf(9L)))
    val iv = rows.toDF("event_id", "user_id", "s", "e").repartition(4)
    val ref = canonIvN(graft.ops.Intervals
      .coalesce(iv, "user_id", "s", "e", "event_id"))
    for (shards <- Seq(2, 3, 7)) {
      val got = canonIvN(graft.ops.Intervals
        .coalesce(iv, "user_id", "s", "e", "event_id", timeShards = shards))
      assert(got == ref, s"shards=$shards\nref=$ref\ngot=$got")
    }
  }
}
