package graft.streaming

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus deduplication — the continuous-ingestion twin of the
  * batch [[graft.ops.Dedup.exact]]: documents arriving on a stream are
  * deduplicated by normalized-content fingerprint, FIRST ARRIVAL WINS,
  * and only first arrivals flow downstream (append mode). Replays of an
  * at-least-once upstream collapse on the same fingerprint, so the output
  * is exactly-once per distinct content.
  *
  * Two state regimes, both built on Spark's stateful drop-duplicates
  * operator (one stateful shuffle on the 16-byte fingerprint key; state
  * survives restarts via the checkpoint):
  *
  *   - [[dedupDocs]]: exact over all history — state is one entry per
  *     DISTINCT fingerprint ever seen. Correct at any horizon, and the
  *     right default for corpus builds where a late duplicate must never
  *     resurface; size state-store memory for the distinct-content count
  *     (16-byte keys: ~10⁹ distinct docs ≈ tens of GB across the
  *     cluster's RocksDB stores, not the raw corpus size).
  *   - [[dedupDocsWithinWatermark]]: duplicates are only suppressed
  *     within an event-time watermark horizon — state is bounded by
  *     rate × horizon regardless of history, the standard trade for
  *     feeds where duplicates arrive close together (retries, replayed
  *     pages) rather than epochs apart.
  *
  * The emitted rows carry the input columns plus `fp` (the fingerprint,
  * same definition the batch path groups on, so batch and stream agree on
  * what "duplicate" means).
  */
object StreamDedup {

  /** Exact streaming dedup by content fingerprint, first arrival wins;
    * state grows with distinct content (see class doc).
    */
  def dedupDocs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .dropDuplicates("fp")

  /** Watermark-bounded streaming dedup: suppresses duplicates whose
    * arrivals fall within `horizon` of each other in event time (`tsCol`
    * must be a timestamp column the stream watermarks on); state is
    * bounded by rate × horizon.
    */
  def dedupDocsWithinWatermark(docs: DataFrame, tsCol: String, horizon: String,
                               textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")
}
