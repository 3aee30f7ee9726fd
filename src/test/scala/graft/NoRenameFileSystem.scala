package graft

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import java.net.URI

/** A local filesystem that REFUSES directory renames — the object-store
  * simulation ManifestProtocolSpec runs the ingest against. S3A/GCS
  * "rename" is copy+delete: not atomic, O(data), torn on a crash; a
  * commit protocol is object-store-safe exactly when it never needs
  * one. Small-FILE renames stay allowed (a single-object copy-PUT whose
  * destination appears atomically — the op `StateFs.writeVersioned`'s
  * manifest commit rides), and anything under Spark's own `_temporary`
  * task-commit tree is exempt: the task-output committer is the
  * deployment's pluggable choice (object stores pair a manifest layout
  * with a direct/"magic" committer), not the protocol under test here.
  */
/** A local filesystem masquerading as S3A — for the scheme guards that
  * refuse directory-swap protocols on copy+delete-rename stores
  * (`StateFs.requireAtomicDirRename`). Unlike [[NoRenameFileSystem]]
  * its renames "work" (as S3A's do — that is the hazard: they report
  * success without atomicity), so only the up-front guard stands
  * between a caller and a silent mid-swap loss.
  */
class FakeS3aFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: URI = URI.create("s3a:///")
}

class NoRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "norename"
  override def getUri: URI = URI.create("norename:///")

  override def rename(src: Path, dst: Path): Boolean = {
    val exempt = src.toString.contains("_temporary") ||
      dst.toString.contains("_temporary")
    val isDir =
      try getFileStatus(src).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    if (isDir && !exempt)
      throw new java.io.IOException(
        s"directory rename refused (object-store simulation): $src -> $dst")
    super.rename(src, dst)
  }
}
