package graft.ops

import org.apache.spark.sql.SparkSession

/** Execute a block with adaptive query execution disabled on the session,
  * restoring the prior setting afterwards.
  *
  * Why this exists: AQE re-optimizes the remaining plan after EVERY
  * shuffle-stage materialization, turning one action into a chain of
  * stage-jobs with a driver-side re-planning pause between them. For an
  * iterative operator whose round tables have MULTIPLE consumers
  * ([[Graph.hitsPpm]]: each raw table feeds its normalizing max AND the
  * next join) the per-round plan shape is FIXED — node-sized two-column
  * tables, explicit join keys, skew handled structurally — so the
  * re-planner has nothing to adapt, and its per-stage latency multiplies
  * with iteration count (measured at sf0.1 / 32 cores: the 2-round HITS
  * query drops 2.4 s → 0.6 s with adaptivity off; the win grows with
  * depth). Elsewhere AQE stays on: its runtime coalescing and skew-join
  * splits are exactly the 100 TB posture, and both the window-heavy
  * queries AND single-consumer iteration chains ([[Graph.pageRankPpm]]:
  * 1.19 s adaptive vs 1.51 s fixed — the opposite sign) measurably
  * benefit. Policy per operator, by measurement.
  *
  * The flag is read at EXECUTION time, not plan-build time — so the body
  * must materialize whatever it wants planned non-adaptively (the graph
  * ops end with an eager `localCheckpoint` for exactly this reason).
  *
  * Restore is exception-safe. Concurrent sessions are unaffected (the
  * flag is session-scoped); a concurrent query on the SAME session during
  * the window would merely plan non-adaptively — a performance nuance,
  * never a correctness one.
  */
private[graft] object FixedPlan {
  private val Key = "spark.sql.adaptive.enabled"

  def withAqeOff[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(Key)
    spark.conf.set(Key, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Key, v)
      case None    => spark.conf.unset(Key)
    }
  }
}
