package graft

import graft.sources.Artifacts

class ArtifactsSpec extends SparkSpec {

  test("graft.artifacts.dir moves the artifact root; the default stays tmpdir") {
    val tmp = System.getProperty("java.io.tmpdir").stripSuffix("/")
    val d0 = Artifacts.processScoped(spark, "t", "some/source/key")
    assert(d0.startsWith(s"$tmp/graft-t-"), d0)

    spark.conf.set("graft.artifacts.dir", "/tmp/graft-alt-root/")
    try {
      val d1 = Artifacts.processScoped(spark, "t", "some/source/key")
      assert(d1.startsWith("/tmp/graft-alt-root/graft-t-"), d1)
      // same (kind, appId, full-md5 key) leaf regardless of root — the
      // collision-freedom contract is root-independent
      assert(d1.split("/").last == d0.split("/").last)
    } finally spark.conf.unset("graft.artifacts.dir")
  }

  test("different source keys never collide into one artifact path") {
    val a = Artifacts.processScoped(spark, "k", "dirA")
    val b = Artifacts.processScoped(spark, "k", "dirB")
    assert(a != b)
  }
}
