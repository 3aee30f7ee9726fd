package graft

import graft.sources.IndexFreshness

class IndexFreshnessSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"fresh-$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def writeSource(dir: String, n: Int): Unit =
    (1 to n).map(i => (i.toLong, s"w$i")).toDF("id", "w")
      .coalesce(1).write.mode("overwrite").parquet(dir)

  test("fingerprint is stable, and moves when the source changes") {
    val src = s"${tmp("fp")}/src"
    writeSource(src, 100)
    val fp1 = IndexFreshness.sourceFingerprint(spark, src)
    assert(fp1 == IndexFreshness.sourceFingerprint(spark, src))
    // a rewrite changes file metadata (content length and/or mtime)
    Thread.sleep(5) // mtime granularity guard
    writeSource(src, 101)
    assert(fp1 != IndexFreshness.sourceFingerprint(spark, src))
  }

  test("fingerprint ignores hidden files (markers, _SUCCESS)") {
    val src = s"${tmp("hidden")}/src"
    writeSource(src, 10)
    val fp1 = IndexFreshness.sourceFingerprint(spark, src)
    // planting a marker/underscore file in the dir must not perturb it
    IndexFreshness.markFresh(spark, src, "deadbeef")
    assert(fp1 == IndexFreshness.sourceFingerprint(spark, src))
  }

  test("ensure builds once per source state, rebuilds on change, honors valid") {
    val root = tmp("ensure")
    val src = s"$root/src"
    val art = s"$root/artifact"
    writeSource(src, 50)
    var builds = 0
    def build(): Unit = {
      new java.io.File(art).mkdirs()
      builds += 1
    }
    IndexFreshness.ensure(spark, art, src)(build())
    assert(builds == 1)
    // fresh artifact: second ensure skips the build
    IndexFreshness.ensure(spark, art, src)(build())
    assert(builds == 1)
    // source rewrite invalidates
    Thread.sleep(5)
    writeSource(src, 51)
    IndexFreshness.ensure(spark, art, src)(build())
    assert(builds == 2)
    // a false `valid` predicate forces a rebuild even with a fresh marker
    IndexFreshness.ensure(spark, art, src, valid = false)(build())
    assert(builds == 3)
  }
}
