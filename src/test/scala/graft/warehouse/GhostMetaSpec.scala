package graft.warehouse

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 advice: ghost metas and stale pinned claims.
  *
  *  - (medium) A reclaimer that crashes BETWEEN its two deletes —
  *    manifest gone, meta left — strands a ghost meta at a version
  *    nobody ever published. A later commit claiming that version
  *    must sweep the ghost before publishing: a meta-less commit that
  *    published over it would surface the ghost through
  *    metaOf/committedMetas as committed, and the streaming
  *    skip-if-applied check would silently drop that epoch's rows.
  *  - (low) A meta-CARRYING commit hitting the ghost previously
  *    wedged: its meta putIfAbsent failed, the collision loop's ~4 s
  *    total backoff could never outlast the 30 s orphan grace its own
  *    fresh manifest enjoyed, and the table threw a misleading
  *    'concurrent commit collision'. Now the ghost is cleared under
  *    the manifest claim and the commit proceeds.
  *  - (hardening found during the same review, then DEEPENED by the
  *    round's adversarial self-review) ANY commit — pinned or not —
  *    whose computed version was published by an interleaved winner
  *    and then VACATED by a retention sweep would claim the empty
  *    slot, and the ghost sweep would erase the vacated version's
  *    vacuum-RETAINED ledger meta (vacuum keeps `.meta` files by
  *    design — they ARE the exactly-once ledger), reopening the
  *    double-apply window before publishing CURRENT backwards.
  *    Every commit now re-reads CURRENT under its manifest claim:
  *    a vacated slot refuses loudly (base-dependent) or retries on
  *    the fresh version (base-independent), ledger untouched; pinned
  *    commits are additionally guarded up front and re-checked
  *    between claim and publish.
  *
  * Ghost tests run on BOTH backends — the sweep's conditional delete
  * must hold on the object-store primitive set too.
  */
class GhostMetaSpec extends AnyFunSuite {
  import graft.TestSpark._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private def manPath(tab: String, v: Int): String =
    s"$tab/_versions/" + f"v$v%05d.manifest"

  private def metaPath(tab: String, v: Int): String =
    s"$tab/_versions/" + f"v$v%05d.meta"

  private trait Fixture { def name: String; def mkTable(): String }

  private def localFx: Fixture = new Fixture {
    val name = "local-fs"
    def mkTable(): String = tmp("graft-ghost-local-") + "/t"
  }

  private def objectStoreFx: Fixture = new Fixture {
    val name = "object-store-sim"
    def mkTable(): String = {
      val root = tmp("graft-ghost-obj-")
      CommitBackends.register(root, new ObjectStoreSimBackend)
      root + "/t"
    }
  }

  for (mk <- Seq(() => localFx, () => objectStoreFx)) {
    val fxName = mk().name

    test(s"[$fxName] a ghost meta stranded by a crashed reclaimer is " +
        "swept when a META-LESS commit claims the version — it never " +
        "resurfaces as committed in the exactly-once ledger") {
      import spark.implicits._
      val tab = mk().mkTable()
      val be = CommitBackends.forDir(tab)
      SnapshotTable.overwrite(spark, Seq(1L).toDF("x"), tab,
        Some("epoch-0")) // v0
      // the crash residue: meta at v1 with NO manifest (the reclaimer
      // deleted the orphan manifest, crashed before the meta delete)
      assert(be.putIfAbsent(metaPath(tab, 1),
        "epoch-GHOST".getBytes("UTF-8")))
      val v = SnapshotTable.overwrite(spark, Seq(2L).toDF("x"), tab)
      assert(v === 1)
      assert(SnapshotTable.metaOf(tab, 1).isEmpty,
        "the ghost meta must be swept, not published under v1")
      assert(SnapshotTable.committedMetas(tab) === Seq("epoch-0"),
        "the ledger must never contain a meta no commit wrote")
      assert(SnapshotTable.read(spark, tab)
        .collect().map(_.getLong(0)).toSeq === Seq(2L))
    }

    test(s"[$fxName] a META-CARRYING commit clears the ghost under " +
        "its manifest claim and commits promptly — no 30 s grace " +
        "wedge, no misleading collision error") {
      import spark.implicits._
      val tab = mk().mkTable()
      val be = CommitBackends.forDir(tab)
      SnapshotTable.overwrite(spark, Seq(1L).toDF("x"), tab,
        Some("epoch-0")) // v0
      assert(be.putIfAbsent(metaPath(tab, 1),
        "epoch-GHOST".getBytes("UTF-8")))
      val v = SnapshotTable.append(spark, Seq(2L).toDF("x"), tab,
        Some("epoch-1"))
      assert(v === 1)
      assert(SnapshotTable.metaOf(tab, 1) === Some("epoch-1"))
      assert(SnapshotTable.committedMetas(tab) ===
        Seq("epoch-0", "epoch-1"))
      assert(SnapshotTable.read(spark, tab).count() === 2L)
    }
  }

  test("a PINNED commit whose target slot was published and then " +
      "VACATED by vacuum is refused up front — CURRENT never moves " +
      "backwards over interleaved commits") {
    import spark.implicits._
    val tab = localFx.mkTable()
    val be = CommitBackends.forDir(tab)
    SnapshotTable.overwrite(spark, Seq(0L).toDF("x"), tab, Some("e0"))
    SnapshotTable.append(spark, Seq(1L).toDF("x"), tab, Some("e1"))
    SnapshotTable.append(spark, Seq(2L).toDF("x"), tab, Some("e2"))
    SnapshotTable.append(spark, Seq(3L).toDF("x"), tab, Some("e3"))
    SnapshotTable.vacuum(tab, keepVersions = 1)
    // precondition: the retention sweep really vacated the target slot
    // — without the guard the pinned claim below would SUCCEED here
    assert(!be.exists(manPath(tab, 1)))
    val e = intercept[IllegalStateException] {
      SnapshotTable.overwriteFrom(spark, Seq(99L).toDF("x"), tab,
        expectedCurrent = Some(0), meta = Some("stale-fold"))
    }
    assert(e.getMessage.contains("stale"),
      s"wrong failure shape: ${e.getMessage}")
    assert(SnapshotTable.currentVersionOf(tab) === Some(3))
    assert(!be.exists(manPath(tab, 1)),
      "the refused commit must leave no claim objects behind")
    assert(!SnapshotTable.committedMetas(tab).contains("stale-fold"))
    assert(SnapshotTable.read(spark, tab).count() === 4L)
  }

  test("a stalled UNPINNED commit whose computed slot was published " +
      "and VACATED refuses loudly (base-dependent) — and NEVER " +
      "erases the vacated version's vacuum-retained ledger meta " +
      "(the exactly-once ledger survives the ghost sweep)") {
    import spark.implicits._
    val tab = localFx.mkTable()
    SnapshotTable.overwrite(spark, Seq(0L).toDF("x"), tab, Some("e0"))
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    // the stall window, landed through the pre-claim seam: between
    // this append computing v=1 and claiming it, a winner publishes
    // v1..v3 and a retention sweep expires their manifests while
    // RETAINING the .meta ledger — the claim then succeeds on the
    // genuinely empty slot
    SnapshotTable.preClaimTestHook = Some { (d, v) =>
      if (d == tab && v == 1 && fired.compareAndSet(false, true)) {
        SnapshotTable.append(spark, Seq(1L).toDF("x"), tab, Some("e1"))
        SnapshotTable.append(spark, Seq(2L).toDF("x"), tab, Some("e2"))
        SnapshotTable.append(spark, Seq(3L).toDF("x"), tab, Some("e3"))
        // graced sweep (the deployment default): the commit under
        // test has already WRITTEN its data files — an ungraced
        // concurrent sweep would eat them (the exact race the
        // fresh-file grace closes); manifest expiry is unaffected
        SnapshotTable.vacuum(tab, keepVersions = 1,
          freshGraceMs = 60000L)
        ()
      }
    }
    try {
      val e = intercept[IllegalStateException] {
        SnapshotTable.append(spark, Seq(9L).toDF("x"), tab,
          Some("late-epoch"))
      }
      assert(fired.get(), "the stall window never fired — seam moved")
      assert(e.getMessage.contains("stale"),
        s"wrong failure shape: ${e.getMessage}")
    } finally SnapshotTable.preClaimTestHook = None
    assert(SnapshotTable.currentVersionOf(tab) === Some(3),
      "CURRENT must never move backwards")
    // THE round's deepest self-caught assertion: epoch e1's ledger
    // line was published at v1 and its manifest vacuumed — the
    // refused commit must leave it intact, or a re-delivered e1
    // would double-apply
    assert(SnapshotTable.metaOf(tab, 1) === Some("e1"),
      "the vacated version's RETAINED ledger meta was erased — the " +
      "double-apply window is reopened")
    assert(SnapshotTable.committedMetas(tab) ===
      Seq("e0", "e1", "e2", "e3"))
    assert(!SnapshotTable.committedMetas(tab).contains("late-epoch"))
  }

  test("a stalled UNPINNED base-INDEPENDENT commit (overwrite) in the " +
      "same vacated-slot stall retries on a fresh version — ledger " +
      "intact, every meta exactly once") {
    import spark.implicits._
    val tab = localFx.mkTable()
    SnapshotTable.overwrite(spark, Seq(0L).toDF("x"), tab, Some("e0"))
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotTable.preClaimTestHook = Some { (d, v) =>
      if (d == tab && v == 1 && fired.compareAndSet(false, true)) {
        SnapshotTable.append(spark, Seq(1L).toDF("x"), tab, Some("e1"))
        SnapshotTable.append(spark, Seq(2L).toDF("x"), tab, Some("e2"))
        SnapshotTable.append(spark, Seq(3L).toDF("x"), tab, Some("e3"))
        // graced sweep (the deployment default): the commit under
        // test has already WRITTEN its data files — an ungraced
        // concurrent sweep would eat them (the exact race the
        // fresh-file grace closes); manifest expiry is unaffected
        SnapshotTable.vacuum(tab, keepVersions = 1,
          freshGraceMs = 60000L)
        ()
      }
    }
    try {
      val v = SnapshotTable.overwrite(spark, Seq(9L).toDF("x"), tab,
        Some("late-overwrite"))
      assert(fired.get(), "the stall window never fired — seam moved")
      assert(v === 4, "the retry must land on the FRESH next version")
    } finally SnapshotTable.preClaimTestHook = None
    assert(SnapshotTable.metaOf(tab, 1) === Some("e1"))
    val metas = SnapshotTable.committedMetas(tab)
    assert(metas === Seq("e0", "e1", "e2", "e3", "late-overwrite"))
    assert(SnapshotTable.read(spark, tab)
      .collect().map(_.getLong(0)).toSeq === Seq(9L))
  }

  test("a PINNED commit that goes stale BETWEEN claim and publish " +
      "(winner + vacuum interleaved through the cross-process " +
      "window) aborts, withdraws its claim objects, and publishes " +
      "nothing") {
    import spark.implicits._
    val tab = localFx.mkTable()
    val be = CommitBackends.forDir(tab)
    SnapshotTable.overwrite(spark, Seq(0L).toDF("x"), tab, Some("e0"))
    // emulate, through the pre-publish seam, the interleaving only a
    // second PROCESS can produce (in-process the slot is held by the
    // commit under test): between the stale-pin guard's CURRENT read
    // and the claim, a winner published v1..v3 and a retention sweep
    // vacated slot 1 — by publish time CURRENT has moved past the
    // claimed version
    SnapshotTable.prePublishTestHook = Some { (d, v) =>
      if (d == tab && v == 1)
        be.put(s"$tab/_versions/CURRENT", "3 e3".getBytes("UTF-8"))
    }
    try {
      val e = intercept[IllegalStateException] {
        SnapshotTable.overwriteFrom(spark, Seq(99L).toDF("x"), tab,
          expectedCurrent = Some(0), meta = Some("stale-fold"))
      }
      assert(e.getMessage.contains("between claim and publish"),
        s"wrong failure shape: ${e.getMessage}")
    } finally SnapshotTable.prePublishTestHook = None
    assert(SnapshotTable.currentVersionOf(tab) === Some(3),
      "CURRENT must never be moved backwards")
    assert(!be.exists(manPath(tab, 1)) && !be.exists(metaPath(tab, 1)),
      "the aborted commit must withdraw its manifest AND meta")
  }
}
