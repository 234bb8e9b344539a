package graft

import graft.warehouse.CommitBackend

/** [[graft.warehouse.CommitBackend]] decorator with FAULT INJECTION —
  * the round-20 CONTROL-PLANE analog of [[FaultFs]] (round-19
  * verdict 4): the round-19 concurrency fixes (torn capture, lost
  * update) were found by adversarial review, not injection. This
  * decorator lets a spec sweep an injected fault across every
  * control-plane call site of the serving verbs (serveResolve,
  * appendFromKnown, vacuumPinned and the commit protocol under
  * them), asserting recapture-retry or loud-unpublished at each —
  * so the next control-plane race is caught by construction.
  *
  * Fault shapes, configured on the companion like [[FaultFs]]:
  *   - transient (default): the op throws IOException — a store 5xx;
  *   - `vanish` (read ops only): readIfExists answers None / exists
  *     answers false — an eventually-consistent or concurrently
  *     deleted object, WITHOUT an exception.
  * Scope: an operation name + a path substring + a fire-after count
  * (the fault fires from the (after+1)-th matching call on). `hits`
  * counts actual firings so a spec proves the injection engaged.
  */
final class FaultBackend(u: CommitBackend) extends CommitBackend {
  import FaultBackend._

  override def putIfAbsent(path: String, bytes: Array[Byte]): Boolean = {
    maybeFail("putIfAbsent", path)
    u.putIfAbsent(path, bytes)
  }

  override def put(path: String, bytes: Array[Byte]): Unit = {
    maybeFail("put", path)
    u.put(path, bytes)
  }

  override def readIfExists(path: String): Option[Array[Byte]] = {
    if (maybeFail("readIfExists", path)) return None // vanish
    u.readIfExists(path)
  }

  override def exists(path: String): Boolean = {
    if (maybeFail("exists", path)) return false // vanish
    u.exists(path)
  }

  override def delete(path: String): Boolean = {
    maybeFail("delete", path)
    u.delete(path)
  }

  override def deleteIfMatches(path: String,
      expected: Array[Byte]): Boolean = {
    maybeFail("deleteIfMatches", path)
    u.deleteIfMatches(path, expected)
  }

  override def ageMs(path: String): Option[Long] = {
    maybeFail("ageMs", path)
    u.ageMs(path)
  }

  override def ensureDir(dir: String): Unit = u.ensureDir(dir)
}

object FaultBackend {
  @volatile private var armedOp: String = null
  @volatile private var pathContains: String = ""
  @volatile private var vanishMode: Boolean = false
  @volatile private var afterN: Int = 0
  private val seen = new java.util.concurrent.atomic.AtomicInteger(0)
  val hits = new java.util.concurrent.atomic.AtomicLong(0)

  /** Arm ONE fault: `op` at paths containing `contains`, firing from
    * the (after+1)-th matching call. `vanish=true` (read ops) makes
    * the object silently absent instead of throwing. */
  def arm(op: String, contains: String, after: Int = 0,
      vanish: Boolean = false): Unit = {
    afterN = after
    pathContains = contains
    vanishMode = vanish
    seen.set(0)
    hits.set(0)
    armedOp = op // last: publish only once the rest is visible
  }

  def disarm(): Unit = {
    armedOp = null
  }

  /** True = vanish (caller answers absent); throws on transient;
    * false = no fault. */
  private def maybeFail(op: String, path: String): Boolean = {
    val a = armedOp
    if (a == null || a != op || !path.contains(pathContains)) return false
    if (seen.incrementAndGet() <= afterN) return false
    hits.incrementAndGet()
    if (vanishMode) true
    else throw new java.io.IOException(
      s"injected transient control-plane fault ($op on …" +
      path.takeRight(40) + ")")
  }
}
