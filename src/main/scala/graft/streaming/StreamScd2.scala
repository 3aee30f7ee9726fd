package graft.streaming

import graft.ops.Scd2
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Continuous SCD2 dimension maintenance — the streaming twin of
  * [[graft.ops.Scd2.applyCdc]], completing the temporal family's
  * batch/stream pairing (intervals → [[StreamIntervals]], sessions →
  * [[EventStream]], aggregates → [[IncrementalAgg]]). The reference's
  * monitor mode implies continuously maintained dimensions (every
  * upsert of a doc id opens a new version and closes the previous one,
  * `index.js:143-170`); batch `applyCdc` proves apply ≡ full rebuild
  * once, this class keeps that equality true UNDER A STREAM of version
  * batches.
  *
  * Per micro-batch (`foreachBatch`): read the current dimension, run
  * the O(batch + touched-history) CDC apply, land the result as a new
  * `data-<batchId>` directory, and flip the `_current` pointer file to
  * it atomically.
  *
  * Exactly-once under at-least-once delivery: `applyCdc` is NOT
  * idempotent (re-applying an absorbed batch would re-union its version
  * rows and double-number the history), so the dimension data and the
  * batch id that built it must become visible TOGETHER — the pointer
  * file is that atomic unit: its content names `data-<batchId>`, and a
  * tmp-write + ATOMIC_MOVE is the flip. Crash before the flip: the
  * replay re-applies onto the old pointer's data — correct; the
  * abandoned directory is swept at the next apply. Crash after the
  * flip: the replay reads `batchId <= applied` and skips — correct, the
  * data already includes it. A batch id further back than the replay
  * margin means the streaming checkpoint was reset against an existing
  * dimension — fail loudly rather than silently fork the history
  * (the [[StreamIngest]] maintained-aggregate rule).
  *
  * Scale shape: identical to batch `applyCdc` — untouched entities pass
  * through the size-gated broadcast anti join and never re-shuffle;
  * touched entities re-window over their own history only;
  * `timeShards`/`autoThreshold` forward to [[graft.ops.TimeShard]] for
  * bot entities. Nothing driver-side grows with the dimension: the
  * pointer is one line, the sweep walks ≤ a handful of directory names.
  */
final class StreamScd2(
    spark: SparkSession, dimDir: String,
    entityCol: String = "user_id", tieCol: String = "event_id",
    tsCol: String = "ts", timeShards: Int = 1, autoThreshold: Long = 0L,
    broadcastThreshold: Long = 4000000L) {

  private val root = Paths.get(dimDir)
  private val pointer = root.resolve("_current")
  Files.createDirectories(root)

  /** `(directory, batchId)` of the live dimension, None before batch 0. */
  private def current(): Option[(Path, Long)] =
    if (Files.exists(pointer)) {
      val name = Files.readString(pointer).trim
      Some((root.resolve(name), name.stripPrefix("data-").toLong))
    } else None

  /** Last batch id the live dimension includes (−1 before batch 0). */
  def appliedBatch(): Long = current().map(_._2).getOrElse(-1L)

  /** The live dimension table, None before the first batch lands. */
  def dim(): Option[DataFrame] =
    current().map { case (dir, _) => spark.read.parquet(dir.toString) }

  /** Point-in-time-correct enrichment of `events` against the LIVE
    * dimension ([[graft.ops.Scd2.lookup]]): each event joins the
    * version valid at its own timestamp, so a micro-batch enriched
    * mid-stream gets exactly the rows a batch lookup over the final
    * dimension would give it for the same events — the feature-store
    * join that prevents label leakage (today's dimension row must never
    * decorate yesterday's event). None before the first batch lands.
    * `events` must not carry dimension column names other than the
    * entity key (rename first — [[graft.ops.Scd2.lookup]] enforces it);
    * the dimension's tie column surfaces as `version_<tieCol>`.
    */
  def lookup(events: DataFrame, eventTsCol: String = "ts",
             joinType: String = "left"): Option[DataFrame] =
    dim().map { d =>
      graft.ops.Scd2.lookup(events,
        d.withColumnRenamed(tieCol, s"version_$tieCol"),
        entityCol, eventTsCol, joinType = joinType)
    }

  /** One micro-batch application; also callable directly for replay
    * tests. The batch must carry `(entityCol, tieCol, tsCol)`.
    */
  def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    val applied = appliedBatch()
    if (batchId <= applied) {
      val margin = StreamIngest.replayMargin(spark)
      if (applied - batchId > margin)
        throw new IllegalStateException(
          s"dimension batchId went backwards: got $batchId but $applied is " +
            s"already applied (more than the replay margin of $margin). The " +
            "streaming checkpoint was likely reset against an existing " +
            s"dimension. Delete $dimDir to rebuild from the stream, or " +
            "restore the original checkpointLocation.")
      return
    }
    // sweep abandoned directories (a crashed write, the flipped-away
    // previous dimension) BEFORE reading current — never after the flip,
    // when a crash window would leave the pointer naming a swept dir
    val keep = current().map(_._1.getFileName.toString)
    val ls = Files.list(root)
    try ls.forEach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("data-") && !keep.contains(n))
        StreamIngest.deleteRecursively(p)
    } finally ls.close()
    val versions = batch.select(col(entityCol), col(tieCol), col(tsCol))
    val next = dim() match {
      case Some(d) => Scd2.applyCdc(d, versions, entityCol, tieCol, tsCol,
        timeShards, broadcastThreshold, autoThreshold)
      case None => Scd2.build(versions, entityCol, tieCol, tsCol,
        timeShards, autoThreshold)
    }
    val target = root.resolve(s"data-$batchId")
    next.write.parquet(target.toString)
    val tmp = root.resolve("._current.tmp")
    Files.writeString(tmp, s"data-$batchId")
    Files.move(tmp, pointer, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Wire a streaming version feed through [[applyBatch]]. */
  def start(versions: DataFrame, checkpointDir: String): StreamingQuery =
    versions.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => applyBatch(b, id))
      .start()
}
