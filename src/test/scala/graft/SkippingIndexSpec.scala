package graft

import graft.ops.Maintenance
import graft.sources.SkippingIndex
import org.apache.spark.sql.functions._

class SkippingIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"skip-$name")
    d.toFile.deleteOnExit()
    s"$d/t"
  }

  test("manifest records per-file rows, nulls, and disjoint ranges") {
    val dir = tmp("build")
    (1L to 1000L).map(i => (i, s"w${i % 7}")).toDF("id", "w")
      .repartitionByRange(4, col("id"))
      .write.parquet(dir)
    val m = SkippingIndex.build(spark, dir, Seq("id", "w"))
      .as[SkippingIndex.ColStats].collect()
    val files = SkippingIndex.dataFiles(spark, dir)
    assert(files.size == 4)
    assert(m.length == 8) // 4 files x 2 columns
    val idStats = m.filter(_.column == "id").sortBy(_.min_num)
    assert(idStats.forall(_.has_stats))
    assert(idStats.map(_.n_rows).sum == 1000L)
    assert(idStats.head.min_num.contains(1.0))
    assert(idStats.last.max_num.contains(1000.0))
    // range partitions are disjoint: each file's [min,max] never overlaps the next
    idStats.sliding(2).foreach { case Array(a, b) =>
      assert(a.max_num.get < b.min_num.get)
    }
  }

  test("numeric pruning skips files and preserves results exactly") {
    val dir = tmp("prune")
    (1L to 1000L).map(i => (i, i % 10)).toDF("id", "v")
      .repartitionByRange(8, col("id"))
      .write.parquet(dir)
    SkippingIndex.build(spark, dir, Seq("id"))
    val kept = SkippingIndex.prunedFiles(spark, dir, "id", Some(100L), Some(220L))
    assert(kept.size < 8, s"expected pruning, kept ${kept.size}/8")
    val pruned = SkippingIndex.read(spark, dir, "id", Some(100L), Some(220L))
      .select("id").as[Long].collect().sorted
    assert(pruned.toSeq == (100L to 220L))
  }

  test("string pruning works on UTF8 stats") {
    val dir = tmp("str")
    ('a' to 'z').flatMap(c => (1 to 40).map(i => (s"$c$i", i)))
      .toDF("k", "n")
      .repartitionByRange(6, col("k"))
      .write.parquet(dir)
    SkippingIndex.build(spark, dir, Seq("k"))
    val kept = SkippingIndex.prunedFiles(spark, dir, "k", Some("b"), Some("c~"))
    assert(kept.size < 6, s"kept ${kept.size}/6")
    val got = SkippingIndex.read(spark, dir, "k", Some("b"), Some("c~"))
      .select("k").as[String].collect().toSet
    val want = spark.read.parquet(dir)
      .where(col("k") >= "b" && col("k") <= "c~")
      .select("k").as[String].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("all-null files are skipped; open bounds work") {
    val dir = tmp("nulls")
    // shard 0 carries only nulls in v; shards 1-3 carry values
    (1L to 400L).map(i => (i, if (i <= 100) None else Some(i)))
      .toDF("id", "v")
      .repartitionByRange(4, col("id"))
      .write.parquet(dir)
    SkippingIndex.build(spark, dir, Seq("v"))
    val keptLow = SkippingIndex.prunedFiles(spark, dir, "v", None, Some(150L))
    assert(keptLow.size < 4, "all-null file should be skipped")
    val got = SkippingIndex.read(spark, dir, "v", None, Some(150L))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == (101L to 150L))
  }

  test("files appearing after build are kept (conservative), result parity holds") {
    val dir = tmp("stale")
    (1L to 100L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(2, col("id")).write.parquet(dir)
    SkippingIndex.build(spark, dir, Seq("id"))
    // append new data the manifest has never seen
    (101L to 200L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val got = SkippingIndex.read(spark, dir, "id", Some(150L), Some(160L))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == (150L to 160L)) // unmanifested file was scanned
  }

  test("z-order layout prunes on BOTH dims; lexicographic only on the first") {
    val n = 32
    val grid = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")

    val zDir = tmp("zorder")
    Maintenance.zOrderWrite(df, zDir, parts = 16, bits = 5, "x", "y")
    SkippingIndex.build(spark, zDir, Seq("x", "y"))

    val lexDir = tmp("lex")
    df.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(lexDir)
    SkippingIndex.build(spark, lexDir, Seq("x", "y"))

    def keptCount(dir: String, c: String) =
      SkippingIndex.prunedFiles(spark, dir, c, Some(0L), Some(3L)).size

    // first dim: both layouts prune hard
    assert(keptCount(zDir, "x") < 16 && keptCount(lexDir, "x") < 16)
    // second dim: only the z-order layout localizes y — lexicographic
    // files each span the full y range and can never be skipped
    assert(keptCount(lexDir, "y") == 16)
    assert(keptCount(zDir, "y") < 16,
      s"z-order should prune on y, kept ${keptCount(zDir, "y")}/16")

    // parity on the pruned read
    val got = SkippingIndex.read(spark, zDir, "y", Some(0L), Some(3L))
      .agg(count(lit(1))).as[Long].head
    assert(got == n * 4L)
  }
}
