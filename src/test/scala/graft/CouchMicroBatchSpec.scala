package graft

import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

class CouchMicroBatchSpec extends SparkSpec {

  def change(seq: Int, id: String, v: Int): String =
    s"""{"seq":"$seq-x","id":"$id","changes":[{"rev":"$seq-r"}],"doc":{"_id":"$id","_rev":"$seq-r","v":$v}}"""

  test("streaming couch-changes source: chunk files become micro-batches") {
    val dir = Files.createTempDirectory("mb-in")
    val ckpt = Files.createTempDirectory("mb-ck").toString
    Files.write(dir.resolve("00001.jsonl"),
      Seq(change(1, "a", 1), change(2, "b", 2)).mkString("\n").getBytes)

    val out = Files.createTempDirectory("mb-out").toString
    val stream = spark.readStream.format("couch-changes").load(dir.toString)
    def run(): Unit = {
      val q = stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).count() == 2)

    // a new spool chunk arrives; restart resumes from the file offset —
    // only the new chunk is read (no duplicates of chunk 1)
    Files.write(dir.resolve("00002.jsonl"),
      Seq(change(3, "c", 3), change(4, "a", 10)).mkString("\n").getBytes)
    run()

    val seqs = spark.read.parquet(out).select("seqNum")
      .collect().map(_.getLong(0)).sorted
    assert(seqs.toSeq == Seq(1L, 2L, 3L, 4L),
      s"expected exactly seqs 1-4 (resume without replay), got ${seqs.toSeq}")
  }

  test("streaming source honors the mango selector option") {
    val dir = Files.createTempDirectory("mb-sel")
    val ckpt = Files.createTempDirectory("mb-sel-ck").toString
    Files.write(dir.resolve("c1.jsonl"),
      (1 to 10).map(i => change(i, s"d$i", i)).mkString("\n").getBytes)
    val q = spark.readStream.format("couch-changes")
      .option("selector", """{"v":{"$gt":7}}""")
      .load(dir.toString)
      .writeStream.format("memory").queryName("mbsel")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("mbsel").count() == 3) // v in {8,9,10}
  }
}
