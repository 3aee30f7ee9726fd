package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Streaming half of the couch-changes source (reference A2, the monitor
  * longpoll loop `index.js:143-170`): a [[MicroBatchStream]] over a
  * directory that a spooler appends chunk files to — each chunk is one
  * `_changes` response body.
  *
  * Offsets are file counts over the lexicographically-sorted chunk list
  * (spoolers name chunks monotonically: `00001.json`, `00002.json`, …) —
  * a micro-batch is the half-open file range `(start, end]`. This is the
  * same recovery contract as the reference's checkpoint seq: restarting
  * from offset N replays nothing and misses nothing as long as chunks are
  * append-only. Readers reuse [[ChangesReader]], so Mango selector
  * evaluation and column pruning work identically in batch and streaming.
  *
  * `spark.readStream.format("couch-changes").load(dir)`.
  */
final case class ChangesFileOffset(fileCount: Int) extends Offset {
  override def json(): String = s"""{"fileCount":$fileCount}"""
}

final class CouchChangesMicroBatch(path: String, selector: Option[String],
                                   schema: StructType)
    extends MicroBatchStream {

  private def chunkFiles(): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.isFile).map(_.getAbsolutePath).sorted.toSeq
    else if (f.isFile) Seq(f.getAbsolutePath)
    else Seq.empty
  }

  override def initialOffset(): Offset = ChangesFileOffset(0)

  override def latestOffset(): Offset = ChangesFileOffset(chunkFiles().size)

  override def deserializeOffset(json: String): Offset = {
    val n = "\\d+".r.findFirstIn(json).map(_.toInt).getOrElse(0)
    ChangesFileOffset(n)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ChangesFileOffset].fileCount
    val e = end.asInstanceOf[ChangesFileOffset].fileCount
    chunkFiles().slice(s, e).map(p => ChangesPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangesReaderFactory(schema, Array.empty, selector)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
