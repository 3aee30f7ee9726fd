package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** The shared `foreachBatch` protocol of the checkpointed sinks (JDBC,
  * Elasticsearch): validate the seq column, upsert the batch, then
  * advance the checkpoint with the batch's max sequence — written AFTER
  * the data so a crash between the two replays the (idempotent) batch.
  * One implementation so the two sinks cannot drift.
  */
private[sinks] object CheckpointedUpsert {

  def batchFn(upsert: DataFrame => Unit, checkpoint: Long => Unit,
              seqCol: Option[String]): (DataFrame, Long) => Unit = { (batch, _) =>
    val b = batch.cache()
    try {
      seqCol.foreach { c =>
        val dt = b.schema(c).dataType
        val integral = dt == LongType || dt == IntegerType ||
          dt == ShortType || dt == ByteType
        require(integral,
          s"seqCol '$c' is $dt; it must be an integral sequence number " +
            "(e.g. the source's seqNum column, not the string seq token)")
      }
      upsert(b)
      seqCol.foreach { c =>
        import org.apache.spark.sql.functions.{col, max}
        val r = b.agg(max(col(c).cast(LongType))).collect()(0)
        if (!r.isNullAt(0)) checkpoint(r.getLong(0))
      }
    } finally { b.unpersist(); () }
  }
}
