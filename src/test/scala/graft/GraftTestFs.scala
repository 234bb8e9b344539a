package graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.fs.permission.FsPermission

/** A Hadoop FileSystem with a NON-LOCAL scheme (`graftfs://`) that
  * stores bytes on local disk — the spec harness for round-18's
  * backend-portable data plane: a path like `graftfs:/tmp/x` is NOT a
  * local path (java.nio would treat it as a relative file named
  * "graftfs:"), so any data-plane code that still walks java.nio
  * visibly breaks under it, while code routed through the Hadoop
  * FileSystem API (writeData's listing, vacuum's walk/mtime/delete)
  * works — exactly the property a store-addressed (s3a://, hdfs://)
  * warehouse needs. RawLocalFileSystem (not the checksummed
  * LocalFileSystem) so the byte layout on disk mirrors what the specs
  * inspect. Registered per test via
  * `fs.graftfs.impl = classOf[GraftTestFs].getName`.
  *
  * Statuses are SANITIZED: RawLocalFileSystem's deprecated status
  * loads permissions lazily via `new java.io.File(path.toUri)`, which
  * rejects any scheme but "file" — exactly what listFiles'
  * LocatedFileStatus wrapping triggers. Eagerly-stamped permissions
  * keep every consumer scheme-agnostic. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")

  private def sanitize(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication,
      s.getBlockSize, s.getModificationTime, s.getAccessTime,
      FsPermission.getFileDefault, "graft", "graft", s.getPath)

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(sanitize)

  override def getFileStatus(f: Path): FileStatus =
    sanitize(super.getFileStatus(f))
}
