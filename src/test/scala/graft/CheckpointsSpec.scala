package graft

import graft.ops.Checkpoints
import org.scalatest.funsuite.AnyFunSuite

/** Locks the foundation under the iterative ops' release pattern: a
  * `localCheckpoint`ed frame's blocks are RDD-level, so
  * `Dataset.unpersist` (CacheManager-only) is a SILENT NO-OP on them —
  * the trap that made clusters' round-9 per-round release inert.
  * [[graft.ops.Checkpoints.release]] unpersists the backing RDDs of the
  * plan's LogicalRDD leaves directly.
  */
class CheckpointsSpec extends AnyFunSuite with SparkSpec {

  private def sweep(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }

  test("Dataset.unpersist is a no-op on localCheckpoints; release frees the blocks") {
    sweep()
    val sc = spark.sparkContext
    val base = sc.getPersistentRDDs.size
    val df = spark.range(100).toDF("x").localCheckpoint(false)
    df.count() // materializes the lazy checkpoint -> one RDD-level pin
    assert(sc.getPersistentRDDs.size == base + 1)
    df.unpersist(blocking = true) // CacheManager-only: must NOT free it
    assert(sc.getPersistentRDDs.size == base + 1,
      "Dataset.unpersist released checkpoint blocks — Spark changed semantics; " +
        "Checkpoints.release may be obsolete")
    Checkpoints.release(df, blocking = true)
    assert(sc.getPersistentRDDs.size == base)
  }

  test("release on a plain (non-checkpointed) frame is a safe no-op") {
    sweep()
    val df = spark.range(10).toDF("x")
    df.count()
    Checkpoints.release(df, blocking = true) // no LogicalRDD leaves
    assert(df.count() == 10)
  }
}
