package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (key, ts, px); trades: (trade_id, key, ts)
  val quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0),
    ("C", 50L, 7.0) // only after every C trade
  ).toDF("sym", "qts", "px")
  val trades = Seq(
    (1L, "A", 5L),   // before any A quote
    (2L, "A", 20L),  // exactly at a quote ts -> inclusive
    (3L, "A", 25L),  // between quotes -> ts=20 quote
    (4L, "B", 100L), // latest B quote
    (5L, "C", 40L)   // no quote at-or-before
  ).toDF("trade_id", "sym", "tts")

  test("as-of join picks the latest right row at-or-before, inclusive ties") {
    val got = AsOfJoin.asOf(trades, quotes, "sym", "sym", "tts", "qts",
        Seq("px"), tieBreak = "px")
      .select("trade_id", "px")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(2L -> 2.0, 3L -> 2.0, 4L -> 9.0))
  }

  test("left as-of keeps unmatched left rows with NULL carried columns") {
    val got = AsOfJoin.asOf(trades, quotes, "sym", "sym", "tts", "qts",
        Seq("px"), tieBreak = "px", joinType = "left")
      .select("trade_id", "px")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(1L -> None, 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> Some(9.0), 5L -> None))
  }

  test("same-(key,ts) right rows resolve to the greatest tiebreak value") {
    val q2 = Seq(("A", 10L, 1.0), ("A", 10L, 5.0), ("A", 10L, 3.0)).toDF("sym", "qts", "px")
    val t2 = Seq((1L, "A", 10L)).toDF("trade_id", "sym", "tts")
    val got = AsOfJoin.asOf(t2, q2, "sym", "sym", "tts", "qts", Seq("px"), tieBreak = "px")
      .select("px").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(5.0))
  }

  test("NULL right values never mix columns from different right rows") {
    // latest quote has px=NULL: the carried (px, sz) must BOTH come from
    // that row — not px from an older row and sz from the newer one
    val q = Seq(
      ("A", 10L, Some(1.0), 100L),
      ("A", 20L, None, 200L)
    ).toDF("sym", "qts", "px", "sz")
    val tr = Seq((1L, "A", 30L)).toDF("trade_id", "sym", "tts")
    val row = AsOfJoin.asOf(tr, q, "sym", "sym", "tts", "qts",
        Seq("px", "sz"), tieBreak = "sz")
      .select("px", "sz").collect()(0)
    assert(row.isNullAt(0) && row.getLong(1) == 200L)
  }

  test("randomized: matches the naive per-row definition (dense ties)") {
    // small key/time domains force heavy key and timestamp collisions
    val rnd = new scala.util.Random(42)
    val rQuotes = Seq.fill(120)((s"K${rnd.nextInt(5)}", rnd.nextInt(20).toLong, rnd.nextInt(1000).toDouble))
    val rTrades = Seq.tabulate(80)(i => (i.toLong, s"K${rnd.nextInt(5)}", rnd.nextInt(20).toLong))

    // naive reference: latest quote at-or-before; ties by max ts then max px
    val expected = rTrades.flatMap { case (id, k, t) =>
      val cands = rQuotes.filter(q => q._1 == k && q._2 <= t)
      if (cands.isEmpty) None
      else {
        val best = cands.maxBy(q => (q._2, q._3))
        Some(id -> best._3)
      }
    }.toMap

    val got = AsOfJoin.asOf(
        rTrades.toDF("trade_id", "sym", "tts"),
        rQuotes.toDF("sym", "qts", "px"),
        "sym", "sym", "tts", "qts", Seq("px"), tieBreak = "px")
      .select("trade_id", "px")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("time-sharded form is bit-identical to the single-window form on a hot key") {
    // one key holding the whole timeline — the shape the (key, shard)
    // shuffle exists for; dense ts collisions force carry-in reads at
    // many shard boundaries and tie resolution inside shards
    val rnd = new scala.util.Random(7)
    val hq = Seq.fill(900)(("H", rnd.nextInt(300).toLong, rnd.nextInt(1000).toDouble))
      .toDF("sym", "qts", "px")
    val ht = Seq.tabulate(600)(i => (i.toLong, "H", rnd.nextInt(300).toLong))
      .toDF("trade_id", "sym", "tts")
    def run(shards: Int) = AsOfJoin.asOf(ht, hq, "sym", "sym", "tts", "qts",
        Seq("px"), tieBreak = "px", joinType = "left", timeShards = shards)
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(run(32) == run(1))
  }

  test("time-sharded form matches the window form with NULL timestamps") {
    // NULL sort keys take the dedicated first shard (-1), matching the
    // window's NULLS FIRST `_t` order: a NULL-ts probe must see NO
    // carry-in (nothing sorts before it in the single window), and a
    // NULL-ts quote must sort before — and be superseded by — every
    // real quote, in both forms
    val q = Seq(("H", null, 5.0), ("H", java.lang.Long.valueOf(10L), 1.0),
        ("H", java.lang.Long.valueOf(200L), 2.0))
      .toDF("sym", "qts", "px")
    val t = Seq((1L, "H", null), (2L, "H", java.lang.Long.valueOf(5L)),
        (3L, "H", java.lang.Long.valueOf(50L)),
        (4L, "H", java.lang.Long.valueOf(300L)))
      .toDF("trade_id", "sym", "tts")
    def run(shards: Int) = AsOfJoin.asOf(t, q, "sym", "sym", "tts", "qts",
        Seq("px"), tieBreak = "px", joinType = "left", timeShards = shards)
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val ref = run(1)
    // the window semantic: NULL-ts trade sees only the NULL-ts quote;
    // real trades see the latest real quote at-or-before
    assert(ref == Map(1L -> Some(5.0), 2L -> Some(5.0),
      3L -> Some(1.0), 4L -> Some(2.0)))
    for (shards <- Seq(2, 3, 8)) assert(run(shards) == ref, s"shards=$shards")
  }

  test("tolerance: matches older than leftTs - tol null out (left) or drop (inner)") {
    val trades = Seq((1L, "A", 100L), (2L, "A", 200L), (3L, "B", 50L))
      .toDF("trade_id", "sym", "tts")
    val quotes = Seq(("A", 95L, 9.5), ("A", 120L, 1.2), ("B", 49L, 4.9))
      .toDF("sym", "qts", "px")
    // tol=30: trade 1 sees quote@95 (gap 5, in), trade 2's latest is
    // quote@120 (gap 80, OUT — and the older 95 must NOT be substituted:
    // as-of picks the latest, tolerance then nulls it), trade 3 in (gap 1)
    val left = AsOfJoin.asOf(trades, quotes, "sym", "sym", "tts", "qts",
        Seq("px"), tieBreak = "px", joinType = "left", tolerance = Some(30L))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(left == Map(1L -> Some(9.5), 2L -> None, 3L -> Some(4.9)))
    val inner = AsOfJoin.asOf(trades, quotes, "sym", "sym", "tts", "qts",
        Seq("px"), tieBreak = "px", joinType = "inner", tolerance = Some(30L))
      .select("trade_id").as[Long].collect().toSet
    assert(inner == Set(1L, 3L))
  }
}
