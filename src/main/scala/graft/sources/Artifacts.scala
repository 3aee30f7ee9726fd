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

  // dir -> the Hadoop configuration it was registered under: the
  // artifact is WRITTEN through Spark's Hadoop path resolution (a
  // schemeless /tmp path lands on fs.defaultFS, not necessarily the
  // driver's local disk), so the cleanup must resolve the SAME
  // filesystem — a java.nio delete would silently no-op on any cluster
  // deployment and leak a directory per run, the exact local-vs-Hadoop
  // split StateFs exists to prevent
  private val registered = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.hadoop.conf.Configuration]()

  // one hook for the whole process, installed on first use. Registered
  // with Hadoop's ShutdownHookManager ABOVE the FileSystem cache-close
  // priority (10) so the deletes run while the filesystems are still
  // open — a plain Runtime hook would race FileSystem.closeAll.
  private lazy val hookInstalled: Unit =
    org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
      new Runnable {
        def run(): Unit = registered.forEach { (d, conf) =>
          try {
            val p = new org.apache.hadoop.fs.Path(d)
            val fs = p.getFileSystem(conf)
            if (fs.exists(p)) { fs.delete(p, true); () }
          } catch { case _: Exception => () } // best-effort: cleanup never
                                              // masks the JVM's exit path
        }
      }, 50)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  /** A collision-free, process-scoped, shutdown-cleaned artifact
    * directory for (`kind`, `sourceKey`), under the `graft.artifacts.dir`
    * session conf when set, else `java.io.tmpdir`. The conf exists
    * because a schemeless tmpdir string resolves against `fs.defaultFS`
    * — on HDFS `/tmp` is a shared, quota-risky root, and on some object
    * stores it is not writable at all — so production deployments name
    * the placement explicitly (any Hadoop-resolvable URI works; the
    * cleanup hook resolves the same filesystem).
    */
  def processScoped(spark: SparkSession, kind: String, sourceKey: String): String = {
    val root = spark.conf.getOption("graft.artifacts.dir")
      .map(_.stripSuffix("/"))
      .getOrElse(System.getProperty("java.io.tmpdir").stripSuffix("/"))
    val dir = s"$root/graft-$kind-" +
      s"${spark.sparkContext.applicationId}-${md5hex(sourceKey)}"
    hookInstalled
    registered.put(dir, spark.sparkContext.hadoopConfiguration)
    dir
  }
}
