package graft

import graft.streaming.DriftMaintenance
import org.apache.spark.sql.functions._
import java.nio.file.Files

class DriftMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val b1 = Seq(
    (1L, "alpha beta gamma delta", "wiki"),
    (2L, "spam click buy now", "web")
  ).toDF("doc_id", "text", "source")
  private val b2 = Seq(
    (3L, "alpha beta epsilon zeta", "wiki"),
    (4L, "alpha spam beta click", "web")
  ).toDF("doc_id", "text", "source")

  test("maintained drift equals the batch operator on the union; replays skip; resets fail") {
    val dir = Files.createTempDirectory("drift-maint").toString
    val dm = new DriftMaintenance(dir, buckets = 64)
    assert(dm.drift().isEmpty)

    dm.applyBatch(b1, 0L)
    dm.applyBatch(b2, 1L)

    // exact parity with the batch operator over everything ingested
    val batch = TrainingQueries.sourceDrift(b1.unionByName(b2), buckets = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dm.drift() == batch)

    // replay of an applied batch is a no-op (exactly-once)
    dm.applyBatch(b2, 1L)
    assert(dm.drift() == batch)

    // a batchId far behind the marker (reset checkpoint) fails loudly
    intercept[IllegalStateException] { dm.applyBatch(b1, -5L) }

    // state survives a new instance (restart)
    assert(new DriftMaintenance(dir, buckets = 64).drift() == batch)
  }

  test("a pre-r12 cells.tsv migrates into the versioned scheme with state intact") {
    val dir = Files.createTempDirectory("drift-legacy").toString
    val dm = new DriftMaintenance(dir, buckets = 64)
    dm.applyBatch(b1, 0L)
    dm.applyBatch(b2, 1L)
    val batch = dm.drift()
    // rewrite as the LEGACY layout: header line "<applied>\t<buckets>"
    // under the fixed name `cells.tsv` (the new header is buckets alone)
    val root = java.nio.file.Paths.get(dir)
    val body = Files.readString(root.resolve("cells-1.tsv"))
    Files.delete(root.resolve("cells-1.tsv"))
    Files.writeString(root.resolve("cells.tsv"), "1\t" + body)
    val dm2 = new DriftMaintenance(dir, buckets = 64)
    assert(dm2.drift() == batch, "legacy state must migrate")
    assert(!Files.exists(root.resolve("cells.tsv")))
    // the bucket-count guard survives the re-headed payload
    intercept[IllegalStateException] {
      new DriftMaintenance(dir, buckets = 32).drift()
    }
  }

  test("the EARLIEST legacy header (batch id alone, no bucket field) migrates too") {
    val dir = Files.createTempDirectory("drift-legacy0").toString
    val dm = new DriftMaintenance(dir, buckets = 64)
    dm.applyBatch(b1, 0L)
    dm.applyBatch(b2, 1L)
    val batch = dm.drift()
    val root = java.nio.file.Paths.get(dir)
    // the earliest legacy layout headed the file with the batch id ALONE
    // (its reader tolerated the absent bucket field) — cells only below
    val cells = Files.readString(root.resolve("cells-1.tsv"))
      .split("\n", 2)(1)
    Files.delete(root.resolve("cells-1.tsv"))
    Files.writeString(root.resolve("cells.tsv"), "1\n" + cells)
    val dm2 = new DriftMaintenance(dir, buckets = 64)
    assert(dm2.drift() == batch,
      "an id-only legacy header must re-head with this instance's buckets")
    assert(!Files.exists(root.resolve("cells.tsv")))
  }

  test("rejects unpersistable source values") {
    val dir = Files.createTempDirectory("drift-maint-bad").toString
    val dm = new DriftMaintenance(dir, buckets = 16)
    val bad = Seq((1L, "x y", "tab\there")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException] { dm.applyBatch(bad, 0L) }
  }

  test("null-source docs are outside monitoring, matching the batch twin") {
    val dir = Files.createTempDirectory("drift-maint-null").toString
    val dm = new DriftMaintenance(dir, buckets = 64)
    val withNull = b1.unionByName(
      Seq((9L, "orphan words here", null.asInstanceOf[String]))
        .toDF("doc_id", "text", "source"))
    dm.applyBatch(withNull, 0L) // must not NPE or wedge
    val batch = TrainingQueries.sourceDrift(withNull, buckets = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dm.drift() == batch)
    assert(!dm.drift().keySet.contains(null))
  }

  test("restarting with a different bucket count fails loudly") {
    val dir = Files.createTempDirectory("drift-maint-buckets").toString
    new DriftMaintenance(dir, buckets = 64).applyBatch(b1, 0L)
    val e = intercept[IllegalStateException] {
      new DriftMaintenance(dir, buckets = 32).drift()
    }
    assert(e.getMessage.contains("buckets"))
  }
}
