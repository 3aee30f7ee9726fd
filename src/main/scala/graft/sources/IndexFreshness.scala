package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Source-freshness contract for derived access paths (inverted indexes,
  * skipping layouts, band indexes): a fingerprint of the SOURCE's file
  * metadata decides whether a persisted artifact is current, so the
  * artifact is built ONCE per source state and every later query pays a
  * driver-side listing instead of a corpus pass. This is the standard
  * warehouse index contract — indexes are maintained, not rebuilt per
  * query — made explicit: any change to the source files (append,
  * compaction, overwrite, a new snapshot) changes the fingerprint and
  * forces a rebuild; an untouched source validates in one RPC.
  *
  * The fingerprint hashes the sorted (relative name, length,
  * modification time) triples of the source directory's data files —
  * listing-only, never a data scan, the same signal Spark's own
  * file-index cache invalidates on. It is CONSERVATIVE in the common
  * direction: a rewrite producing byte-identical files still
  * re-fingerprints (mtimes moved), costing a redundant rebuild, never a
  * stale read. One documented gap in the other direction: a rewrite
  * that preserves every file's NAME and LENGTH and lands within the
  * filesystem's mtime granularity (1 s on ext4-noatime-style mounts,
  * 1 ms on HDFS/local java.io) is invisible to a listing-only signal —
  * the same blind spot Spark's file-index cache has. Writers that
  * rewrite in place at sub-granularity cadence (no Spark sink does:
  * Spark writes fresh part-file names per job) must version the
  * directory or pass a stronger `valid` predicate to [[ensure]];
  * reading file CONTENT here would turn every freshness probe into a
  * corpus scan and defeat the contract.
  *
  * Concurrency: two processes racing on the same artifact directory can
  * interleave build and marker writes, so artifact paths should be
  * per-process (the scored queries key them on `applicationId`); within
  * a process, builds of the same artifact are driver-sequential.
  */
object IndexFreshness {
  private val MarkerName = "_graft_src_fingerprint"

  /** Fingerprint of `dir`'s file-metadata state (see object doc).
    * Hidden files (`_`/`.` prefixes — markers, Spark `_SUCCESS`,
    * checksums) are excluded: they carry no row data and the marker
    * itself must not perturb the key.
    */
  def sourceFingerprint(spark: SparkSession, dir: String): String = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        if (st.isDirectory) walk(st.getPath)
        else entries += s"$n|${st.getLen}|${st.getModificationTime}"
      }
    }
    walk(root)
    val md = java.security.MessageDigest.getInstance("MD5")
    entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().map(b => f"${b & 0xff}%02x").mkString
  }

  /** True iff `artifactDir` carries a marker recording `fp`. Reads the
    * marker to EOF — the InputStream contract allows any single
    * `read(buf)` to return short, and a short first read would make a
    * genuinely fresh artifact compare unequal and rebuild spuriously.
    */
  def isFresh(spark: SparkSession, artifactDir: String, fp: String): Boolean = {
    val marker = new Path(artifactDir, MarkerName)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(marker) && {
      val in = fs.open(marker)
      try {
        val out = new java.io.ByteArrayOutputStream(64)
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        // bound the loop: a corrupt oversized marker can never be fresh
        while (n > 0 && out.size <= 4096) { out.write(buf, 0, n); n = in.read(buf) }
        out.size > 0 && out.size <= 4096 &&
          new String(out.toByteArray, "UTF-8").trim == fp
      } finally in.close()
    }
  }

  /** Record `fp` on `artifactDir` (call AFTER the build completes — a
    * build that overwrites the directory also clears the old marker, so
    * a crashed build can never leave a fresh-looking stale artifact).
    */
  def markFresh(spark: SparkSession, artifactDir: String, fp: String): Unit = {
    val marker = new Path(artifactDir, MarkerName)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(marker, true)
    try out.write(fp.getBytes("UTF-8")) finally out.close()
  }

  /** Run `build` unless `artifactDir` is already fresh for `sourceDir`'s
    * current file state; marks the artifact fresh after a build. The
    * extra `valid` predicate guards artifact forms with state outside
    * the directory (e.g. a catalog-table entry a fresh JVM won't have).
    */
  def ensure(spark: SparkSession, artifactDir: String, sourceDir: String,
             valid: => Boolean = true)(build: => Unit): Unit = {
    val fp = sourceFingerprint(spark, sourceDir)
    if (!(valid && isFresh(spark, artifactDir, fp))) {
      build
      markFresh(spark, artifactDir, fp)
    }
  }
}
