package graft.sources

import org.apache.spark.sql.SparkSession

/** Process-scoped directories for the scored queries' derived artifacts
  * (inverted index, skipping layout, shingle/gram tables): one naming
  * rule and one cleanup rule, shared by every site.
  *
  *   - `applicationId` in the path: concurrent harness processes must
  *     never race each other's mode-overwrite builds (the
  *     [[IndexFreshness]] concurrency contract).
  *   - The FULL md5 of the source key (not a 32-bit `hashCode`): two
  *     different source dirs in one application must never collide into
  *     one artifact path and thrash rebuilds.
  *   - Every directory registers with ONE JVM shutdown hook that
  *     deletes it: a harness process that builds artifacts under
  *     `java.io.tmpdir` no longer leaks a directory per run. (A
  *     PRODUCTION deployment does the opposite on purpose — it persists
  *     artifacts at stable cluster paths so the build amortizes across
  *     processes; this helper is the ephemeral, per-process variant the
  *     scored queries need.)
  */
private[graft] object Artifacts {

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  // one hook for the whole process, installed on first use
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.forEach { d =>
        try graft.streaming.StreamIngest.deleteRecursively(
          java.nio.file.Paths.get(d))
        catch { case _: Exception => () } // best-effort: cleanup never
                                          // masks the JVM's exit path
      }))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  /** A collision-free, process-scoped, shutdown-cleaned artifact
    * directory under `java.io.tmpdir` for (`kind`, `sourceKey`).
    */
  def processScoped(spark: SparkSession, kind: String, sourceKey: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-$kind-" +
      s"${spark.sparkContext.applicationId}-${md5hex(sourceKey)}"
    hookInstalled
    registered.add(dir)
    dir
  }
}
