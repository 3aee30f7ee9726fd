package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Ordered-conversion funnel first-times with the [[TimeShard]] hot-key
  * escape — per key, the first stage-0 time, then for each later stage i
  * the first stage-i time STRICTLY after the key's stage-(i−1) first
  * time (the product-analytics funnel the reference's event warehouses
  * feed; the scored `q_funnel` aggregates this table's non-null counts).
  *
  * Scale shape, and where the skew actually lives: every stage min is a
  * map-side-combinable aggregate — a bot key's millions of rows collapse
  * to one row per map task BEFORE any shuffle — so the aggregates never
  * funnel. What does is the THRESHOLD JOIN: stage i filters its events
  * against the key's stage-(i−1) time, and that per-key join routes all
  * of a bot key's stage-i events through the one hash partition owning
  * the key — linear, but single-task and unbounded (the SCALE.md carry
  * probe measured the scored form fine at a 4M-event bot precisely
  * because the cost is a stream, not a sort; at 100× the bot it is
  * still one task). The `timeShards` escape spreads it: shard ids ride
  * the [[TimeShard.hybrid]] bounds pass, the per-key thresholds
  * replicate per (key, shard) — the shard-granularity carry DEGENERATES
  * to replication here because the threshold is a per-KEY constant, not
  * running state; the funnel's running-min fold happens across STAGES
  * (the chained aggregates), not along the timeline — and the join runs
  * on (key, shard), so a bot's stage events land on `timeShards` tasks.
  * With `autoThreshold > 0` only keys above the threshold pay the extra
  * joins; cold keys ride the plain plan (the production posture — see
  * TimeShard's measured default policy).
  *
  * NULL semantics match the single-window family contract: a NULL key
  * is ONE ordinary group (all joins here are null-safe `<=>`), and a
  * NULL timestamp never satisfies a strict `>` threshold nor wins a
  * `min` — both forms agree bit-for-bit (CarryPropertySpec randomizes
  * NULL keys AND timestamps over both).
  *
  * Output: one row per key with ≥ 1 stage-0 event; columns
  * `(keyCol, t0, t1, …)` where `t_i` is NULL when stage i was never
  * reached (`t0` itself is NULL when every stage-0 timestamp is NULL —
  * the key still counts as having entered the funnel, matching the SQL
  * `GROUP BY` form).
  */
object Funnel {

  /** Output column carrying stage `i`'s first time. */
  def stageCol(i: Int): String = s"t$i"

  private val JoinKey = "_fu"
  private val EvTs = "_fts"

  def firstTimes(events: DataFrame, keyCol: String, tsCol: String,
                 typeCol: String, stages: Seq[String],
                 timeShards: Int = 1, autoThreshold: Long = 0L): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got $stages")
    val outCols = stages.indices.map(stageCol)
    val clash = (outCols :+ JoinKey :+ EvTs).filter(Set(keyCol, tsCol, typeCol))
    require(clash.isEmpty,
      s"columns ${clash.mkString(", ")} collide with funnel internals — " +
        "rename them first")

    // stage 0: one map-side-combinable aggregate (no join, no escape)
    def stage0(df: DataFrame): DataFrame =
      df.where(col(typeCol) === stages.head)
        .groupBy(col(keyCol)).agg(min(col(tsCol)).as(stageCol(0)))

    def grouped(i: Int): Seq[Column] =
      col(keyCol) +: (0 until i).map(j => col(stageCol(j)))

    // plain plan: per-key threshold join + conditional min per stage
    def single(df: DataFrame): DataFrame =
      stages.indices.tail.foldLeft(stage0(df)) { (acc, i) =>
        val stageEv = df.where(col(typeCol) === stages(i))
          .select(col(keyCol).as(JoinKey), col(tsCol).as(EvTs))
        acc.join(stageEv, col(keyCol) <=> col(JoinKey), "left_outer")
          .groupBy(grouped(i): _*)
          .agg(min(when(col(EvTs) > col(stageCol(i - 1)), col(EvTs)))
            .as(stageCol(i)))
      }

    // sharded plan: the threshold replicates per (key, shard) and the
    // join spreads on both — see the scaladoc for why the carry is pure
    // replication here. The per-key min then re-aggregates across shards
    // (map-side combinable: each (key, shard) task emits one row).
    def sharded(dfS: DataFrame): DataFrame = {
      val shardIds = typedLit((-1 until timeShards).toArray)
      stages.indices.tail.foldLeft(stage0(dfS)) { (acc, i) =>
        val carry = acc.select(col(keyCol), col(stageCol(i - 1)))
          .withColumn(TimeShard.ShardCol, explode(shardIds))
        val stageEv = dfS.where(col(typeCol) === stages(i))
          .select(col(keyCol), col(TimeShard.ShardCol), col(tsCol).as(EvTs))
        val mins = TimeShard.joinCarry(stageEv, carry, keyCol)
          .groupBy(col(keyCol))
          .agg(min(when(col(EvTs) > col(stageCol(i - 1)), col(EvTs)))
            .as(stageCol(i)))
          .withColumnRenamed(keyCol, JoinKey)
        // keys with no stage-i events keep their row (t_i NULL): the
        // inner carry join above only sees stage-i rows
        acc.join(mins, col(keyCol) <=> col(JoinKey), "left_outer").drop(JoinKey)
      }
    }

    val pruned = events.select(col(keyCol), col(typeCol), col(tsCol))
    TimeShard.hybrid(pruned, keyCol, col(tsCol), timeShards,
      autoThreshold)(single)(sharded)
  }
}
