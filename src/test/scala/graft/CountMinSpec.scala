package graft

import graft.functions.{CountMinEstimate, CountMinSketchAgg}
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(values: Seq[Long], depth: Int = 4, width: Int = 64,
                       partitions: Int = 4) =
    spark.sparkContext.parallelize(values, partitions).toDF("v")
      .agg(CountMinSketchAgg(col("v"), depth, width).as("sk"))

  test("estimates never underestimate and are exact for well-spread keys") {
    val values = Seq.tabulate(300)(i => (i % 10).toLong) // 10 keys × 30 each
    val probes = (0L until 10L).toDF("key")
    val got = sketchOf(values).crossJoin(probes)
      .select(col("key"), CountMinEstimate(col("sk"), col("key")).as("est"))
      .as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { k =>
      assert(got(k) >= 30L, s"CMS must never underestimate (key $k)")
      assert(got(k) <= 30L + 300L * 3 / 64,
        s"estimate for key $k outside the e/width*N bound")
    }
  }

  test("partial sketches merge across partitions to the single-partition result") {
    val values = Seq.fill(50)(7L) ++ Seq.tabulate(40)(i => (100 + i).toLong)
    val onePart = sketchOf(values, partitions = 1)
      .select(col("sk")).collect()(0).getSeq[Long](0)
    val manyPart = sketchOf(values, partitions = 8)
      .select(col("sk")).collect()(0).getSeq[Long](0)
    assert(onePart == manyPart, "counter merge must be partition-invariant")
    assert(onePart.take(2) == Seq(4L, 64L), "header carries depth and width")
    assert(onePart.drop(2).sum == 90L * 4, "each value increments one counter per row")
  }

  test("CMS property: estimates never fall below exact counts (random streams)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 400)
      vs <- Gen.listOfN(n, Gen.choose(0L, 25L)) // heavy collisions
      d <- Gen.choose(1, 5)
      w <- Gen.oneOf(4, 16, 64)
    } yield (vs, d, w)
    val prop = Prop.forAll(gen) { case (vs, d, w) =>
      val sk = sketchOf(vs, depth = d, width = w)
        .select(col("sk")).collect()(0).getSeq[Long](0).toArray
      val exact = vs.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (k, n) =>
        graft.functions.CountMin.estimate(sk, k) >= n
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("streaming sketch maintenance: exactly-once under replay, restart, reset") {
    import graft.streaming.SketchMaintenance
    val dir = java.nio.file.Files.createTempDirectory("cms-maint").toString
    val sm = new SketchMaintenance(dir, "k", depth = 4, width = 64)
    assert(sm.estimate(7L) == 0L, "empty sketch estimates zero")

    def batch(vs: Long*) = vs.toDF("k")
    sm.applyBatch(batch(7L, 7L, 8L), 0L)
    sm.applyBatch(batch(7L, 9L), 1L)
    assert(sm.estimate(7L) >= 3L)
    val before = sm.sketch().get.toSeq

    // replayed batch: the merge is NOT idempotent, the marker must skip it
    sm.applyBatch(batch(7L, 9L), 1L)
    assert(sm.sketch().get.toSeq == before, "replay must not double-count")

    // restart: a new instance reads the persisted sketch
    val sm2 = new SketchMaintenance(dir, "k", depth = 4, width = 64)
    assert(sm2.sketch().get.toSeq == before)
    sm2.applyBatch(batch(7L), 2L)
    assert(sm2.estimate(7L) >= 4L)

    // reset checkpoint (batchId far behind the marker) fails loudly
    val e = intercept[IllegalStateException] { sm2.applyBatch(batch(1L), 0L) }
    assert(e.getMessage.contains("batchId went backwards"))

    // mismatched dimensions are rejected, not silently merged
    intercept[IllegalArgumentException] {
      new SketchMaintenance(dir, "k", depth = 2, width = 32).sketch()
    }
  }

  test("a pre-r12 cms.bin migrates into the versioned scheme with state intact") {
    import graft.streaming.SketchMaintenance
    val dir = java.nio.file.Files.createTempDirectory("cms-legacy").toString
    val sm = new SketchMaintenance(dir, "k", depth = 4, width = 64)
    sm.applyBatch(Seq(7L, 7L, 8L).toDF("k"), 0L)
    sm.applyBatch(Seq(7L).toDF("k"), 1L)
    val before = sm.sketch().get.toSeq
    // rewrite the committed state as the LEGACY single-file layout:
    // [batchId(8 bytes)][counters...] under the fixed name `cms.bin`
    val root = java.nio.file.Paths.get(dir)
    val counters = java.nio.file.Files.readAllBytes(root.resolve("cms-1.bin"))
    val bb = java.nio.ByteBuffer.allocate(8 + counters.length)
    bb.putLong(1L); bb.put(counters)
    java.nio.file.Files.delete(root.resolve("cms-1.bin"))
    java.nio.file.Files.write(root.resolve("cms.bin"), bb.array())
    // a fresh instance must read the migrated state — NOT (-1, empty),
    // which would silently merge the next batch into nothing
    val sm2 = new SketchMaintenance(dir, "k", depth = 4, width = 64)
    assert(sm2.sketch().get.toSeq == before, "legacy state must migrate")
    assert(!java.nio.file.Files.exists(root.resolve("cms.bin")),
      "the legacy file must retire after migration")
    // exactly-once semantics survive the migration: the replay skips,
    // the stream continues
    sm2.applyBatch(Seq(9L).toDF("k"), 1L)
    assert(sm2.sketch().get.toSeq == before)
    sm2.applyBatch(Seq(9L).toDF("k"), 2L)
    assert(sm2.estimate(9L) >= 1L)
  }

  test("nulls are ignored; an unseen key estimates only collision mass") {
    val df = Seq(Some(1L), None, Some(1L), None).toDF("v")
    val sk = df.agg(CountMinSketchAgg(col("v"), 4, 64).as("sk"))
    val est = sk.select(
        CountMinEstimate(col("sk"), lit(1L)).as("seen"),
        CountMinEstimate(col("sk"), lit(999L)).as("unseen"))
      .as[(Long, Long)].collect()(0)
    assert(est._1 == 2L)
    assert(est._2 <= 2L) // at worst full collision with the only key
  }
}
