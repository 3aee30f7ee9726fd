package graft

import graft.ops.Scd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // (entity, version-id, ts): u1 has 3 versions, u2 has 1, u3 arrives
  // only in the batch; same-ts versions for u4 exercise the tie key
  lazy val oldV = Seq(
    ("u1", 1L, 100L), ("u1", 2L, 200L), ("u2", 3L, 150L),
    ("u4", 7L, 500L), ("u4", 8L, 500L)
  ).toDF("user_id", "event_id", "ts")
  lazy val batch = Seq(
    ("u1", 4L, 300L), ("u3", 5L, 250L), ("u3", 6L, 400L)
  ).toDF("user_id", "event_id", "ts")

  private def canon(df: DataFrame): Set[(String, Long, Long, Option[Long], Long, Boolean)] =
    df.collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4), r.getBoolean(5))
    }.toSet

  test("build: intervals chain, versions rank, exactly one open row per entity") {
    val dim = Scd2.build(oldV)
    val rows = canon(dim)
    assert(rows(("u1", 1L, 100L, Some(200L), 1L, false)))
    assert(rows(("u1", 2L, 200L, None, 2L, true)))
    assert(rows(("u2", 3L, 150L, None, 1L, true)))
    // same-ts versions order by the tie key deterministically
    assert(rows(("u4", 7L, 500L, Some(500L), 1L, false)))
    assert(rows(("u4", 8L, 500L, None, 2L, true)))
  }

  test("applyCdc equals a full rebuild over old ∪ batch") {
    val merged = Scd2.applyCdc(Scd2.build(oldV), batch)
    val rebuilt = Scd2.build(oldV.unionByName(batch))
    assert(canon(merged) == canon(rebuilt))
    // the merge closed u1's open row, continued its versions, created u3
    val rows = canon(merged)
    assert(rows(("u1", 2L, 200L, Some(300L), 2L, false)))
    assert(rows(("u1", 4L, 300L, None, 3L, true)))
    assert(rows(("u3", 6L, 400L, None, 2L, true)))
    // untouched entities pass through byte-identical
    assert(rows(("u2", 3L, 150L, None, 1L, true)))
  }

  test("empty batch is the identity") {
    val dim = Scd2.build(oldV)
    assert(canon(Scd2.applyCdc(dim, batch.limit(0))) == canon(dim))
  }

  test("lookup: each event gets the version valid at its ts, boundaries half-open") {
    val dim = Scd2.build(oldV)
      .select(col("user_id"), col("event_id").as("version_event"),
        col("valid_from"), col("valid_to"), col("version"))
    // u1 versions: [100,200) v1, [200,∞) v2
    val events = Seq(
      ("e1", "u1", 99L),   // before first version -> NULL
      ("e2", "u1", 100L),  // valid_from inclusive -> v1
      ("e3", "u1", 199L),  // inside -> v1
      ("e4", "u1", 200L),  // valid_to exclusive / next valid_from -> v2
      ("e5", "u1", 9999L), // open current row -> v2
      ("e6", "u9", 100L)   // unknown entity -> NULL
    ).toDF("eid", "user_id", "ts")
    val got = Scd2.lookup(events, dim, "user_id", "ts")
      .select("eid", "version").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map("e1" -> None, "e2" -> Some(1L), "e3" -> Some(1L),
      "e4" -> Some(2L), "e5" -> Some(2L), "e6" -> None))
    // inner join drops the unmatched events instead
    val inner = Scd2.lookup(events, dim, "user_id", "ts", joinType = "inner")
    assert(inner.select("eid").collect().map(_.getString(0)).toSet ==
      Set("e2", "e3", "e4", "e5"))
    // the plan is an equi-key join on the entity, never a cross-product
    val looked = Scd2.lookup(events, dim, "user_id", "ts")
    looked.collect()
    val p = looked.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"lookup must keep the entity equi-key join shape:\n${p.take(2000)}")
  }

  test("lookup: NULL entities match the NULL-entity history; NULL ts matches nothing") {
    val vRows = Seq[(Option[String], Long, Long)](
      (None, 1L, 100L), (None, 2L, 200L), (Some("u1"), 3L, 100L))
    val v = vRows.toDF("user_id", "event_id", "ts")
    val dim = Scd2.build(v)
      .select(col("user_id"), col("event_id").as("version_event"),
        col("valid_from"), col("valid_to"), col("version"))
    val eRows = Seq[(String, Option[String], Option[Long])](
      ("e1", None, Some(150L)),  // NULL entity -> NULL-group v1
      ("e2", None, Some(250L)),  // NULL entity -> NULL-group v2
      ("e3", Some("u1"), None))  // NULL ts: no interval contains it
    val events = eRows.toDF("eid", "user_id", "ts")
    val got = Scd2.lookup(events, dim, "user_id", "ts")
      .select("eid", "version").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map("e1" -> Some(1L), "e2" -> Some(2L), "e3" -> None))
  }

  test("lookup: the as-of sharded/auto forms are bit-identical to the join form") {
    val rnd = new scala.util.Random(7)
    // versions: clumpy timestamps WITH ties (same-ts version chains),
    // NULL entities (a window group), NULL timestamps (invisible to the
    // interval predicate — the as-of form must filter them)
    val vRows = (0 until 400).map { i =>
      val ent: java.lang.Long = if (i % 37 == 0) null else (i % 10).toLong
      val ts: java.lang.Long =
        if (i % 29 == 0) null else (rnd.nextInt(50) * 10).toLong
      (ent, i.toLong, ts)
    }
    val dim0 = Scd2.build(vRows.toDF("user_id", "event_id", "ts"))
      .select(col("user_id"), col("event_id").as("version_event"),
        col("valid_from"), col("valid_to"), col("version"))
    // plus a CLOSED-TAIL entity (a deleted dimension row): events after
    // valid_to must read as NO match — the as-of carry alone would keep
    // matching them, the expiry check is what this pins
    val closed = Seq(
      (99L, 1000L, 50L, Some(100L), 1L), (99L, 1001L, 100L, Some(200L), 2L)
    ).toDF("user_id", "version_event", "valid_from", "valid_to", "version")
      .select(col("user_id"), col("version_event"), col("valid_from"),
        col("valid_to").cast("long").as("valid_to"), col("version"))
    val dim = dim0.unionByName(closed)
    val eRows = (0 until 600).map { i =>
      val ent: java.lang.Long =
        if (i % 41 == 0) null else if (i % 13 == 0) 99L else (i % 12).toLong
      val ts: java.lang.Long =
        if (i % 31 == 0) null else rnd.nextInt(520).toLong
      (i.toLong, ent, ts)
    }
    val events = eRows.toDF("eid", "user_id", "ts")
    def canon(df: DataFrame): Set[Seq[Any]] =
      df.select("eid", "user_id", "ts", "version_event", "valid_from",
          "valid_to", "version")
        .collect().map(_.toSeq.map(Option(_))).toSet
    for (joinType <- Seq("left", "inner")) {
      val plain = canon(Scd2.lookup(events, dim, "user_id", "ts",
        joinType = joinType))
      for ((sh, thr) <- Seq((8, 0L), (8, 30L), (3, 5L))) {
        val got = canon(Scd2.lookup(events, dim, "user_id", "ts",
          joinType = joinType, timeShards = sh, autoThreshold = thr))
        assert(got == plain,
          s"as-of lookup diverged at joinType=$joinType shards=$sh thr=$thr")
      }
    }
    // the closed tail really is exercised: entity 99 events past ts=200
    // exist and carry NULL enrichment
    val tail = Scd2.lookup(events, dim, "user_id", "ts",
      timeShards = 4, autoThreshold = 0L)
      .where(col("user_id") === 99L && col("ts") >= 200L)
    assert(tail.count() > 0 && tail.where(col("version").isNotNull).count() == 0)
  }

  test("lookup rejects unsupported join types on BOTH plan paths") {
    val dim = Scd2.build(oldV)
      .select(col("user_id"), col("event_id").as("version_event"),
        col("valid_from"), col("valid_to"), col("version"))
    val events = Seq(("u1", 150L)).toDF("user_id", "ts")
    for (shards <- Seq(1, 4)) {
      val e = intercept[IllegalArgumentException] {
        Scd2.lookup(events, dim, "user_id", "ts", joinType = "full",
          timeShards = shards)
      }
      assert(e.getMessage.contains("inner|left"),
        s"joinType must be validated at shards=$shards — an outer type " +
          "returns unmatched DIMENSION rows and the output stops being " +
          "event-sized")
    }
  }

  test("lookup rejects colliding dimension/event column names") {
    val dim = Scd2.build(oldV)
    val events = Seq(("u1", 1L, 150L)).toDF("user_id", "event_id", "ts")
    val e = intercept[IllegalArgumentException] {
      Scd2.lookup(events, dim, "user_id", "ts")
    }
    assert(e.getMessage.contains("event_id"))
  }

  // deterministic pseudo-random history: clumpy timestamps WITH ties
  // (both within and across would-be shard boundaries), singleton
  // entities, and an entity larger than any shard count under test
  private lazy val randomV = {
    val rows = for {
      u <- 1L to 12L
      i <- 0L until (u * 11 % 40 + 1)
    } yield {
      val mix = u * 2654435761L + i * 40503L
      (s"u$u", u * 1000 + i, 1000L + (mix % 17) * ((i + 1) / 2)) // repeats + ties
    }
    rows.toDF("user_id", "event_id", "ts").repartition(5)
  }

  test("time-sharded build is bit-identical to the window form") {
    val ref = canon(Scd2.build(randomV))
    for (shards <- Seq(2, 3, 7, 64))
      assert(canon(Scd2.build(randomV, timeShards = shards)) == ref,
        s"mismatch at timeShards=$shards")
  }

  test("sharded build closes shard-boundary intervals with the next shard's first ts") {
    // 8 versions at distinct ts spread across 4 shards: every shard's
    // last interval must end at the next shard's first version
    val v = (1L to 8L).map(i => ("b", i, i * 100L)).toDF("user_id", "event_id", "ts")
    val ref = canon(Scd2.build(v))
    assert(canon(Scd2.build(v, timeShards = 4)) == ref)
    // exactly one open row, version numbers 1..8
    assert(ref.count(_._6) == 1 && ref.map(_._5) == (1L to 8L).toSet)
  }

  test("sharded applyCdc still equals a full rebuild") {
    val merged = Scd2.applyCdc(Scd2.build(oldV), batch, timeShards = 3)
    assert(canon(merged) == canon(Scd2.build(oldV.unionByName(batch))))
  }

  test("applyCdc past the broadcast threshold falls back to shuffle joins, same result") {
    // threshold 1 < the batch's 2 touched entities: the hint is dropped
    // and both the anti and semi join go through planner choice — the
    // result must still equal the full rebuild. Planner choice on a
    // 2-row side is still a broadcast (auto-broadcast), so to observe
    // the HINT's presence the auto threshold is disabled: hinted plans
    // broadcast anyway, unhinted plans must not.
    val dim = Scd2.build(oldV)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = Scd2.applyCdc(dim, batch, broadcastThreshold = 1L)
      assert(canon(merged) == canon(Scd2.build(oldV.unionByName(batch))))
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"touched-set broadcast survived past the threshold:\n${plan.take(2000)}")
      // and the gated default still broadcasts (the common CDC batch path)
      val hinted = Scd2.applyCdc(dim, batch)
      assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sharded build keeps its (entity, shard) exchange in the physical plan") {
    // the bounds join leaves HashPartitioning(entity), which SATISFIES the
    // local window's ClusteredDistribution(entity, shard) — without the
    // explicit repartition, EnsureRequirements elides the exchange and
    // silently restores the per-entity funnel (the AsOfJoin lesson)
    val plan = Scd2.build(randomV, timeShards = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(user_id") && plan.contains("_sh"),
      s"missing (user_id, _sh) exchange:\n${plan.take(2000)}")
  }
}
