package graft

import graft.ops.Dedup
import graft.streaming.StreamDedup
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: String, name: String,
                         rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/_stage_$name")
      // the file source lists the top-level dir; land each batch as one
      // atomic file the way a real feed would
      .ensuring(_ => {
        val part = new java.io.File(s"$dir/_stage_$name").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        part.renameTo(new java.io.File(s"$dir/$name.parquet"))
      })

  test("streaming dedup: first arrival wins across micro-batches and restarts") {
    val dir = Files.createTempDirectory("stream-dedup").toString
    val ckpt = Files.createTempDirectory("stream-dedup-ckpt").toString
    val out = Files.createTempDirectory("stream-dedup-out").toString
    val schema = "doc_id LONG, text STRING"

    writeBatch(dir, "b0", Seq(
      1L -> "the quick brown fox",
      2L -> "  the quick  brown fox ", // ws-variant dup of 1, same batch
      3L -> "something else entirely"))

    // file sink (not memory): supports checkpoint recovery, so the
    // restart below genuinely resumes the dedup state
    def start() = StreamDedup.dedupDocs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def emitted(): Set[Long] =
      spark.read.parquet(out).select("doc_id").as[Long].collect().toSet

    val q1 = start()
    q1.processAllAvailable()
    assert(emitted() == Set(1L, 3L)) // ws-variant collapsed within the batch

    writeBatch(dir, "b1", Seq(
      4L -> "the quick brown fox",     // cross-batch dup of 1
      5L -> "fresh unseen content"))
    q1.processAllAvailable()
    assert(emitted() == Set(1L, 3L, 5L)) // 4 suppressed by state
    q1.stop()

    // restart from the checkpoint: state persists, late dup still suppressed
    writeBatch(dir, "b2", Seq(
      6L -> "something else entirely", // dup of 3, arriving after restart
      7L -> "genuinely new after restart"))
    val q2 = start()
    q2.processAllAvailable()
    val afterB2 = emitted()
    assert(afterB2 == Set(1L, 3L, 5L, 7L))
    q2.stop()

    // batch parity: the streamed keep set is exactly the batch keep set
    val allRows = spark.read.parquet(dir)
    val batchKeep = Dedup.exact(allRows).select("keep_id").as[Long].collect().toSet
    assert(afterB2 == batchKeep)
  }

  test("watermark-bounded dedup suppresses near-in-time duplicates") {
    val dir = Files.createTempDirectory("stream-dedup-wm").toString
    val ckpt = Files.createTempDirectory("stream-dedup-wm-ckpt").toString

    Seq(
      (1L, "repeated payload", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, "repeated payload", java.sql.Timestamp.valueOf("2024-01-01 10:02:00")),
      (3L, "other payload", java.sql.Timestamp.valueOf("2024-01-01 10:01:00")))
      .toDF("doc_id", "text", "ts").coalesce(1)
      .write.parquet(s"$dir/batch")

    val q = StreamDedup.dedupDocsWithinWatermark(
      spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
        .parquet(s"$dir/batch"),
      tsCol = "ts", horizon = "10 minutes")
      .writeStream.format("memory").queryName("sdedupwm")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val kept = spark.table("sdedupwm").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // 2 is a within-horizon duplicate of 1
  }
}
