package graft

import org.apache.hadoop.fs.{FileStatus, LocatedFileStatus, Path, RemoteIterator}

/** [[GraftTestFs]] with FAULT INJECTION — the round-19 canary for the
  * backend-portable data plane (round-18 verdict 3): rather than
  * discovering races one at a time (the vanished-tree and
  * vanished-manifest fixes of round 18), a spec sweeps an injected
  * missing-file / transient-IO fault across EVERY FileSystem call
  * site of the vacuum data sweep and the writeData listing, asserting
  * quiet-abort / deferred-sweep / loud-unpublished at each point — so
  * the next race is caught by construction.
  *
  * Scheme `faultfs://` (its own cached FileSystem instance, so arming
  * never affects graftfs tests). Faults are configured on the
  * companion: an operation name, a path-substring scope, and a
  * fire-after count for mid-iteration faults. `hits` counts actual
  * firings so a spec can prove the injection engaged. */
class FaultFs extends GraftTestFs {
  import FaultFs._
  override def getScheme: String = "faultfs"
  override def getUri: java.net.URI = java.net.URI.create("faultfs:///")

  override def getFileStatus(f: Path): FileStatus = {
    maybeFail("getFileStatus", f)
    super.getFileStatus(f)
  }

  // RawLocalFileSystem answers exists() without going through
  // getFileStatus, so the exists-probe fault needs its own hook
  override def exists(f: Path): Boolean = {
    maybeFail("exists", f)
    super.exists(f)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    maybeFail("listStatus", f)
    super.listStatus(f)
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    maybeFail("delete", f)
    super.delete(f, recursive)
  }

  override def listFiles(f: Path,
      recursive: Boolean): RemoteIterator[LocatedFileStatus] = {
    val it = super.listFiles(f, recursive)
    // mid-iteration fault: the listing vanishes AFTER serving some
    // entries — the late-listing race a remote store can exhibit
    new RemoteIterator[LocatedFileStatus] {
      private var served = 0
      def hasNext: Boolean = {
        if (served >= afterN) maybeFail("listFiles", f)
        it.hasNext
      }
      def next(): LocatedFileStatus = {
        if (served >= afterN) maybeFail("listFiles", f)
        served += 1
        it.next()
      }
    }
  }
}

object FaultFs {
  @volatile private var armedOp: String = null
  @volatile private var pathContains: String = ""
  @volatile private[graft] var afterN: Int = 0
  @volatile private var thrower: () => java.io.IOException =
    () => new java.io.FileNotFoundException("injected fault")
  val hits = new java.util.concurrent.atomic.AtomicLong(0)

  def arm(op: String, contains: String, after: Int = 0,
      notFound: Boolean = true): Unit = {
    afterN = after
    pathContains = contains
    thrower =
      if (notFound) () => new java.io.FileNotFoundException(
        s"injected missing-file fault ($op)")
      else () => new java.io.IOException(
        s"injected transient store fault ($op)")
    hits.set(0)
    armedOp = op // last: publish only once the rest is visible
  }

  def disarm(): Unit = {
    armedOp = null
  }

  private def maybeFail(op: String, f: Path): Unit = {
    val a = armedOp
    if (a != null && a == op && f.toString.contains(pathContains)) {
      hits.incrementAndGet()
      throw thrower()
    }
  }
}
