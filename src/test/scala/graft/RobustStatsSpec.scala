package graft

import org.apache.spark.sql.functions._

/** Known-answer tests for q_weighted_quantiles, q_mode, and q_spearman —
  * boundary behaviour (cut-point arithmetic, tie handling) that the
  * fixture's bulk data can't isolate.
  */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def liDir(rows: (String, Double, Double)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("rstats").toString
    rows.toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("weighted quantiles: ceil thresholds at every cut point") {
    // W=8 (weights 1..): thresholds q25=(8+3)/4=2, q50=(8+1)/2=4, q75=(24+3)/4=6
    val dir = liDir(
      ("g", 10.0, 2.0), ("g", 20.0, 2.0), ("g", 30.0, 2.0), ("g", 40.0, 2.0))
    val r = SparkEntry.queries("q_weighted_quantiles")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // cum: 10→2, 20→4, 30→6, 40→8
    assert(r.toSeq == Seq(("g", 10.0, 20.0, 30.0)))
  }

  test("weighted quantiles: one heavy value swallows all cut points") {
    val dir = liDir(("h", 1.0, 1.0), ("h", 99.0, 100.0), ("h", 200.0, 1.0))
    val r = SparkEntry.queries("q_weighted_quantiles")(spark, dir)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3))).head
    assert(r == ((99.0, 99.0, 99.0)))
  }

  test("mode: most frequent value wins; ties break to the smallest value") {
    val dir = liDir(
      ("m", 1.0, 5.0), ("m", 1.0, 5.0), ("m", 1.0, 3.0),   // qty 5 ×2, 3 ×1
      ("t", 1.0, 9.0), ("t", 1.0, 2.0))                    // tie 1-1 → min 2
    val r = SparkEntry.queries("q_mode")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(r("m") == ((5.0, 2L)))
    assert(r("t") == ((2.0, 1L)))
  }

  test("spearman: +1 on any monotone relation, -1 on reversed, ties exact") {
    val mono = (1 to 20).map(i => ("up", math.exp(i.toDouble), i.toDouble))
    val rev = (1 to 20).map(i => ("dn", math.exp(-i.toDouble), i.toDouble))
    val dir = liDir((mono ++ rev).map(r => (r._1, r._2, r._3)): _*)
    val r = SparkEntry.queries("q_spearman")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(r("up") - 1.0) < 1e-12)  // monotone nonlinear → rho 1
    assert(math.abs(r("dn") + 1.0) < 1e-12)
  }

  test("spearman: tied ranks use average-rank (doubled) arithmetic") {
    // x: 1,1,2 (avg ranks 1.5,1.5,3); y: 10,20,30 (ranks 1,2,3)
    // rho = cov/sd: ranks x=(1.5,1.5,3), y=(1,2,3) → rho = sqrt(3)/2
    val dir = liDir(("s", 10.0, 1.0), ("s", 20.0, 1.0), ("s", 30.0, 2.0))
    val got = SparkEntry.queries("q_spearman")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(got("s") - math.sqrt(3.0) / 2) < 1e-12)
  }

  private def evDir(rows: (String, Double)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("rstats-ev").toString
    rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("winsorized mean: tails clamp to the surviving rank values") {
    // n=10, r1=1: rank 1 (0) clamps to rank-2 value 1, rank 10 (1000) to
    // rank-9 value 8 → mean (1 + Σ1..8 + 8)/10 = 4.5
    val dir = evDir(("g" -> 0.0) +: (1 to 8).map(i => "g" -> i.toDouble)
      :+ ("g" -> 1000.0): _*)
    val r = SparkEntry.queries("q_winsorized")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r("g") == 4.5)
  }

  test("winsorized mean: a single-row group returns its value, not NULL") {
    val dir = evDir(("solo" -> 42.5), ("g" -> 1.0), ("g" -> 2.0), ("g" -> 3.0))
    val r = SparkEntry.queries("q_winsorized")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r("solo") == 42.5)
    // n=3: r1=1, r2=2 → rank 1 clamps to rank-2 value 2, rank 3 to 2
    assert(r("g") == (2.0 + 2.0 + 2.0) / 3)
  }

  test("quality percentile: ties-inclusive ppm ranks within each source") {
    // all-lowercase text → punct_ratio 0 → quality = len/500 exactly
    val dir = java.nio.file.Files.createTempDirectory("rstats-doc").toString
    Seq(
      (1L, "src1", "a" * 100), (2L, "src1", "b" * 100), // tied at 0.2
      (3L, "src1", "c" * 200), (4L, "src1", "d" * 300),
      (5L, "src2", "e" * 400)                           // own source: top
    ).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_quality_pctl")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // src1 cums over 4 docs: ties at 0.2 → 2/4, then 3/4, 4/4
    assert(got == Map(1L -> 500000L, 2L -> 500000L, 3L -> 750000L,
      4L -> 1000000L, 5L -> 1000000L))
  }

  test("winsorized mean: a duplicate-value bucket spanning the clamp ranks") {
    // n=10: 0, 5×8, 100 — the 5-bucket covers ranks 2..9, so it is both
    // clamp source and middle mass → mean (5 + 5·8 + 5)/10 = 5.0
    val dir = evDir(("t" -> 0.0) +: Seq.fill(8)("t" -> 5.0)
      :+ ("t" -> 100.0): _*)
    val r = SparkEntry.queries("q_winsorized")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r("t") == 5.0)
  }
}
