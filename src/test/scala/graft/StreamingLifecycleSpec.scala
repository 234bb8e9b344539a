package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{LifecycleIndex, StreamingGraphDelete, StreamingGraphInsert}
import graft.warehouse.SnapshotTable

/** BOTH streaming verbs composed on ONE live index (round 14 — the
  * round-13 verdict headline): insert epochs append walk edges,
  * delete epochs append tombstones, and the maintained graph resolves
  * at read time as prune+repair(base ∪ insert-edges, tombstones) —
  * v27's oracle-checked batch rule. Pins:
  *   - drained interleaved streams ≡ lifecycleMaintainedGraph
  *     row-for-row, for TWO different interleavings (order
  *     independence is the design claim, so it is tested, not argued);
  *   - a delete epoch does NOT wipe previously streamed insert edges
  *     (the round-13 bug), and deleting a streamed insert removes its
  *     edges (delete-wins, vec 0 is in both fixture sets);
  *   - insert epoch 0 and delete epoch 0 coexist (namespaced ledgers,
  *     round-13 advice: per-query batch ids both start at 0);
  *   - a mid-stream fold preserves the invariants and pre-fold epochs
  *     of BOTH streams still re-deliver as no-ops;
  *   - the fold's optimistic CAS (overwriteFrom) fails loudly against
  *     an interleaved commit instead of clobbering it.
  */
class StreamingLifecycleSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.SimilarityQueries

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private def edgeSet(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  private lazy val insertWaves: Seq[org.apache.spark.sql.DataFrame] = {
    val schema = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding", "label").schema
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 89 === 0)
      .select("vec_id", "embedding", "label").collect()
    assert(rows.length >= 3, "need enough inserts to micro-batch")
    rows.grouped(math.max(rows.length / 3, 1)).map(chunk =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toIndexedSeq), schema))
      .toSeq
  }

  private lazy val deleteWaves: Seq[org.apache.spark.sql.DataFrame] = {
    import spark.implicits._
    val dels = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 97 === 0)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(dels.length >= 3, "need enough tombstones to micro-batch")
    dels.grouped(math.max(dels.length / 3, 1))
      .map(_.toSeq.toDF("vec_id")).toSeq
  }

  private def newIndex(): String = {
    val idx = tmp("graft-lifecycle-idx-")
    LifecycleIndex.bootstrap(spark, idx,
      SimilarityQueries.insertFreeBaseGraph(spark, sf))
    idx
  }

  /** Drive the given (isInsert, waveIdx) epoch schedule on a fresh
    * bootstrapped index; returns the index dir. */
  private def drive(schedule: Seq[(Boolean, Int)]): String = {
    val idx = newIndex()
    schedule.foreach {
      case (true, i) =>
        StreamingGraphInsert.insertEpoch(spark, insertWaves(i), sf,
          idx, i.toLong)
      case (false, i) =>
        StreamingGraphDelete.deleteEpoch(spark, deleteWaves(i), sf,
          idx, i.toLong)
    }
    idx
  }

  // order A: strict alternation starting with an insert;
  // order B: all deletes except the last, then all inserts, then
  // the final delete — a delete epoch lands BEFORE any insert and
  // more inserts land after deletes (both round-13 failure shapes)
  private lazy val orderA: Seq[(Boolean, Int)] =
    (0 until math.max(insertWaves.length, deleteWaves.length))
      .flatMap(i =>
        Seq(true -> i).filter(_ => i < insertWaves.length) ++
          Seq(false -> i).filter(_ => i < deleteWaves.length))
  private lazy val orderB: Seq[(Boolean, Int)] =
    (0 until deleteWaves.length - 1).map(false -> _) ++
      (0 until insertWaves.length).map(true -> _) :+
      (false -> (deleteWaves.length - 1))

  test("interleaved insert+delete epochs drain to v27's batch rule, " +
      "for two different interleavings (order independence), with " +
      "delete-wins on a streamed insert and no lost insert edges") {
    val idxA = drive(orderA)
    val idxB = drive(orderB)
    val gotA = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idxA))
    val gotB = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idxB))
    val want =
      edgeSet(SimilarityQueries.lifecycleMaintainedGraph(spark, sf))
    PersistRegistry.release()
    assert(gotA === want,
      "interleaving A must drain to the composed batch rule")
    assert(gotB === gotA,
      "two interleavings of the same epochs must drain identically")

    // namespaced ledgers: insert epoch 0 and delete epoch 0 both
    // applied on one index (per-query batch ids both start at 0)
    assert(SnapshotTable.committedMetas(LifecycleIndex.edgesTab(idxA))
      .contains("ins:batch=0"))
    assert(SnapshotTable.committedMetas(LifecycleIndex.delTab(idxA))
      .contains("del:batch=0"))

    // delete-wins: vec 0 is inserted AND deleted (89·97 both divide
    // 0) — it must not survive as an endpoint anywhere
    val delSet = deleteWaves.flatMap(_.collect().map(_.getLong(0))).toSet
    assert(delSet.contains(0L) &&
      insertWaves.head.collect().map(_.getLong(0)).contains(0L),
      "fixture must exercise the insert-then-delete path via vec 0")
    assert(!gotA.exists { case (u, w) => delSet(u) || delSet(w) },
      "a deleted id survived as a maintained-graph endpoint")

    // the round-13 bug: a delete epoch must not wipe prior streamed
    // insert edges — every SURVIVING insert id keeps its walk edges
    val insIds = insertWaves.flatMap(_.collect().map(_.getLong(0))).toSet
    val survivors = insIds -- delSet
    val sources = gotA.map(_._1).toSet
    assert(survivors.nonEmpty && survivors.forall(sources),
      s"streamed inserts lost their edges in the composed " +
      s"maintenance: missing ${(survivors -- sources).toSeq.sorted}")
  }

  test("two LIVE streams on ONE index — real readStream queries, " +
      "whose per-query batch ids genuinely both start at 0 — drain " +
      "to the batch rule under interleaved triggers") {
    val insIn = tmp("graft-lc-insin-")
    val delIn = tmp("graft-lc-delin-")
    val idx = newIndex()
    val qI = StreamingGraphInsert.start(spark, s"$insIn/*", sf, idx,
      tmp("graft-lc-cki-"))
    val qD = StreamingGraphDelete.start(spark, s"$delIn/*", sf, idx,
      tmp("graft-lc-ckd-"))
    try {
      // interleave real triggers: ins wave 0, del wave 0, the rest
      // of the inserts, the rest of the deletes — both queries'
      // FIRST micro-batch is Spark batch id 0 (the round-13 ledger
      // collision shape, here produced by the real machinery)
      insertWaves.head.coalesce(1).write.parquet(s"$insIn/wave_0")
      qI.processAllAvailable()
      deleteWaves.head.coalesce(1).write.parquet(s"$delIn/wave_0")
      qD.processAllAvailable()
      insertWaves.tail.zipWithIndex.foreach { case (w, i) =>
        w.coalesce(1).write.parquet(s"$insIn/wave_${i + 1}") }
      qI.processAllAvailable()
      deleteWaves.tail.zipWithIndex.foreach { case (w, i) =>
        w.coalesce(1).write.parquet(s"$delIn/wave_${i + 1}") }
      qD.processAllAvailable()
    } finally { qI.stop(); qD.stop() }
    val insMetas =
      SnapshotTable.committedMetas(LifecycleIndex.edgesTab(idx))
    val delMetas =
      SnapshotTable.committedMetas(LifecycleIndex.delTab(idx))
    assert(insMetas.contains("ins:batch=0") &&
      delMetas.contains("del:batch=0"),
      "both real streams must have committed their own epoch 0")
    assert(!insMetas.exists(_.startsWith("del:")) &&
      !delMetas.exists(_.startsWith("ins:")),
      "stream ledgers must never cross tables")
    val got = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idx))
    val want =
      edgeSet(SimilarityQueries.lifecycleMaintainedGraph(spark, sf))
    PersistRegistry.release()
    assert(got === want,
      "two live interleaved streams must drain to the batch rule")
  }

  test("a mid-stream fold preserves the composed invariants, and " +
      "pre-fold epochs of BOTH streams re-deliver as no-ops") {
    val idx = newIndex()
    StreamingGraphInsert.insertEpoch(spark, insertWaves(0), sf, idx, 0L)
    StreamingGraphDelete.deleteEpoch(spark, deleteWaves(0), sf, idx, 0L)
    LifecycleIndex.foldTombstones(spark, sf, idx)
    // the fold materialized base ∪ ins0 pruned/repaired by del0 and
    // restarted both delta tables empty
    assert(SnapshotTable.read(spark,
      LifecycleIndex.delTab(idx)).count() === 0L)
    assert(SnapshotTable.read(spark,
      LifecycleIndex.edgesTab(idx)).count() === 0L)
    // remaining epochs, post-fold
    (1 until insertWaves.length).foreach(i =>
      StreamingGraphInsert.insertEpoch(spark, insertWaves(i), sf, idx,
        i.toLong))
    (1 until deleteWaves.length).foreach(i =>
      StreamingGraphDelete.deleteEpoch(spark, deleteWaves(i), sf, idx,
        i.toLong))
    val got = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idx))
    val delSet = deleteWaves.flatMap(_.collect().map(_.getLong(0))).toSet
    val insIds = insertWaves.flatMap(_.collect().map(_.getLong(0))).toSet
    assert(!got.exists { case (u, w) => delSet(u) || delSet(w) },
      "a deleted id survived across the fold boundary")
    val survivors = insIds -- delSet
    val sources = got.map(_._1).toSet
    assert(survivors.forall(sources),
      "a pre-fold streamed insert lost its edges after the fold")
    // pre-fold re-delivery of BOTH kinds skips via the durable ledger
    val vIns = SnapshotTable.versions(LifecycleIndex.edgesTab(idx)).size
    val vDel = SnapshotTable.versions(LifecycleIndex.delTab(idx)).size
    StreamingGraphInsert.insertEpoch(spark, insertWaves(0), sf, idx, 0L)
    StreamingGraphDelete.deleteEpoch(spark, deleteWaves(0), sf, idx, 0L)
    PersistRegistry.release()
    assert(SnapshotTable.versions(
      LifecycleIndex.edgesTab(idx)).size === vIns,
      "pre-fold insert epoch re-delivery must skip")
    assert(SnapshotTable.versions(
      LifecycleIndex.delTab(idx)).size === vDel,
      "pre-fold delete epoch re-delivery must skip")
    // SECOND fold cycle: a normal later fold must take the derive
    // path (base version advances — the crash-recovery detection must
    // NOT false-trigger on a healthy index), stay observationally
    // silent, and compact the retired set without losing its ledger
    val vBase2 = SnapshotTable.versions(LifecycleIndex.baseTab(idx)).size
    val before2 = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idx))
    LifecycleIndex.foldTombstones(spark, sf, idx)
    assert(SnapshotTable.versions(
      LifecycleIndex.baseTab(idx)).size === vBase2 + 1,
      "a healthy second fold must rewrite the base (no false recovery)")
    assert(SnapshotTable.read(spark,
      LifecycleIndex.delTab(idx)).count() === 0L)
    val after2 = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idx))
    assert(after2 === before2,
      "the second fold must not change the maintained graph")
    // retired: compacted to the distinct cumulative set, with the
    // exactly-once ledger intact through the compaction overwrite
    val rTab = LifecycleIndex.retiredTab(idx)
    assert(SnapshotTable.read(spark, rTab).count() === delSet.size.toLong,
      "retired must hold exactly the distinct cumulative delete set")
    assert(SnapshotTable.committedMetas(rTab).contains("del:batch=0"),
      "the retired ledger must survive its compaction")
    PersistRegistry.release()
  }

  test("insert-side auto-fold: an insert-only stream folds after " +
      "foldEvery epochs — accumulated edges bake into the base, the " +
      "append log restarts with a folded marker, the maintained " +
      "graph is unchanged, and pre-fold epochs still re-deliver as " +
      "no-ops") {
    val idxA = newIndex() // folds after every 2nd epoch
    val idxB = newIndex() // never folds (control)
    insertWaves.indices.foreach { i =>
      StreamingGraphInsert.insertEpoch(spark, insertWaves(i), sf,
        idxA, i.toLong, foldEvery = 2)
      StreamingGraphInsert.insertEpoch(spark, insertWaves(i), sf,
        idxB, i.toLong, foldEvery = Int.MaxValue)
    }
    val eTabA = LifecycleIndex.edgesTab(idxA)
    assert(SnapshotTable.committedMetas(eTabA)
      .exists(_.startsWith("folded-ins:batch=")),
      "the insert-only fold must stamp its marker on the append log")
    // the fold emptied the log; only post-fold epochs re-accumulated
    assert(SnapshotTable.read(spark, eTabA).count() <
      SnapshotTable.read(spark,
        LifecycleIndex.edgesTab(idxB)).count(),
      "the folded index must carry fewer append-log rows than the " +
      "control")
    val gotA = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idxA))
    val gotB = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idxB))
    assert(gotA === gotB,
      "the insert-side fold must not change the maintained graph")
    // a pre-fold epoch re-delivered post-fold is still a no-op
    val v = SnapshotTable.versions(eTabA).size
    StreamingGraphInsert.insertEpoch(spark, insertWaves(0), sf, idxA,
      0L, foldEvery = Int.MaxValue)
    PersistRegistry.release()
    assert(SnapshotTable.versions(eTabA).size === v,
      "pre-fold insert epoch re-delivery must skip post-fold")
  }

  // v27's query set: vec_id < 20, surviving (not tombstoned)
  private def searchQueries = spark.read
    .parquet(s"$sf/embeddings.parquet")
    .filter(col("vec_id") < 20 && pmod(col("vec_id"), lit(97)) =!= 0)
    .select("vec_id", "embedding")

  private def searchRows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq.sorted

  test("search() serves the LIVE index: row-identical to v27's " +
      "batch search on the drained state, results include no " +
      "tombstoned id, and a second search adopts the same snapshot") {
    val idx = drive(orderA)
    val queries = searchQueries
    def rows(df: org.apache.spark.sql.DataFrame) = searchRows(df)
    val got = rows(LifecycleIndex.search(spark, sf, idx, queries))
    val want = rows(graft.SparkEntry
      .queries("v27_lifecycle_search")(spark, sf))
    val delSet = deleteWaves.flatMap(_.collect().map(_.getLong(0))).toSet
    val again = rows(LifecycleIndex.search(spark, sf, idx, queries))
    PersistRegistry.release()
    assert(got.nonEmpty, "the live search must return results")
    assert(got === want,
      "live-index search must equal v27's batch search row-for-row")
    assert(!got.exists { case (_, nb, _) => delSet(nb) },
      "a tombstoned id surfaced in live search results")
    assert(again === got,
      "a repeat search on an unchanged index must be deterministic")
  }

  test("fold crash window: with the folded base committed but the " +
      "delta tables not yet cleared, searches stay correct, and " +
      "re-running the fold heals the state") {
    val idx = drive(orderA)
    val healthy = searchRows(
      LifecycleIndex.search(spark, sf, idx, searchQueries))
    // simulate the documented crash: the fold's FIRST commit (the
    // folded base, stamped with the real `folded-<last epoch>`
    // marker) landed, the ins/del restarts did not. Re-reads must
    // stay SEARCH-correct (duplicate base∪ins edges collapse in the
    // walk's symmetrize-distinct; pruning an already-pruned base is
    // a no-op) — the LifecycleIndex.foldTombstones doc contract.
    val maintained =
      LifecycleIndex.maintainedEdges(spark, sf, idx).distinct()
    val through = LifecycleIndex.pendingFoldMarker(idx).get
    SnapshotTable.overwrite(spark, maintained,
      LifecycleIndex.baseTab(idx), Some(through))
    val crashed = searchRows(
      LifecycleIndex.search(spark, sf, idx, searchQueries))
    assert(crashed === healthy,
      "a half-folded index must keep serving the same results")
    // re-running the fold heals by DETECTION (the base's meta is the
    // marker this fold would stamp): it completes the delta restarts
    // without re-deriving — a re-derivation from the folded base
    // would mint extra repair edges (the still-populated ins table
    // re-induces only a subset of the repair pair space and the
    // top-3 window re-ranks over it), which is exactly how this test
    // first failed
    val vBase = SnapshotTable.versions(LifecycleIndex.baseTab(idx)).size
    LifecycleIndex.foldTombstones(spark, sf, idx)
    assert(SnapshotTable.versions(
      LifecycleIndex.baseTab(idx)).size === vBase,
      "crash recovery must not rewrite the already-folded base")
    assert(SnapshotTable.read(spark,
      LifecycleIndex.delTab(idx)).count() === 0L)
    assert(SnapshotTable.read(spark,
      LifecycleIndex.edgesTab(idx)).count() === 0L)
    val healed = searchRows(
      LifecycleIndex.search(spark, sf, idx, searchQueries))
    PersistRegistry.release()
    assert(healed === healthy,
      "re-running the fold must heal the crash window unchanged")
  }

  /** Reproduce the fold's first commit on `idx` (the crash window:
    * folded base landed, delta restarts did not). */
  private def halfFold(idx: String): Unit = {
    val maintained =
      LifecycleIndex.maintainedEdges(spark, sf, idx).distinct()
    SnapshotTable.overwrite(spark, maintained,
      LifecycleIndex.baseTab(idx),
      Some(LifecycleIndex.pendingFoldMarker(idx).get))
  }

  test("fold crash window + LATER INSERT EPOCHS: the retry folds " +
      "only the un-folded remainder — post-abort insert epochs are " +
      "NOT wiped, and the result equals a clean-fold index") {
    // idxA: ins0+del0, fold ABORTS half-way, then ins1, ins2, retry
    // fold. idxB (reference): ins0+del0, CLEAN fold, then ins1, ins2.
    val idxA = newIndex(); val idxB = newIndex()
    for (idx <- Seq(idxA, idxB)) {
      StreamingGraphInsert.insertEpoch(spark, insertWaves(0), sf, idx, 0L)
      StreamingGraphDelete.deleteEpoch(spark, deleteWaves(0), sf, idx, 0L)
    }
    halfFold(idxA)
    LifecycleIndex.foldTombstones(spark, sf, idxB)
    for (idx <- Seq(idxA, idxB); i <- 1 until insertWaves.length)
      StreamingGraphInsert.insertEpoch(spark, insertWaves(i), sf, idx,
        i.toLong)
    // the retry fold on the half-folded index must preserve the
    // post-abort epochs (the review-caught data-loss shape: the old
    // recovery branch emptied the CURRENT edges table, wiping them)
    LifecycleIndex.foldTombstones(spark, sf, idxA)
    LifecycleIndex.foldTombstones(spark, sf, idxB)
    val gotA = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idxA))
    val gotB = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idxB))
    val lateIns = (1 until insertWaves.length)
      .flatMap(i => insertWaves(i).collect().map(_.getLong(0))).toSet
    val sources = gotA.map(_._1).toSet
    PersistRegistry.release()
    assert(lateIns.nonEmpty && lateIns.forall(sources),
      s"post-abort insert epochs lost by the fold retry: " +
      s"missing ${(lateIns -- sources).toSeq.sorted}")
    assert(gotA === gotB,
      "crash-then-retry must converge to the clean-fold index")
  }

  test("fold crash window + a LATER DELETE EPOCH: the retry derives " +
      "from the un-folded remainder (no repair re-ranked against a " +
      "subset pair space) and equals a clean-fold index") {
    val idxA = newIndex(); val idxB = newIndex()
    for (idx <- Seq(idxA, idxB)) {
      StreamingGraphInsert.insertEpoch(spark, insertWaves(0), sf, idx, 0L)
      StreamingGraphDelete.deleteEpoch(spark, deleteWaves(0), sf, idx, 0L)
    }
    halfFold(idxA)
    LifecycleIndex.foldTombstones(spark, sf, idxB)
    // a delete epoch lands BEFORE the fold retry — the review-caught
    // shape where the exact-marker detection could never match again
    // and the old code fell into the wrong re-derivation
    for (idx <- Seq(idxA, idxB))
      StreamingGraphDelete.deleteEpoch(spark, deleteWaves(1), sf, idx, 1L)
    LifecycleIndex.foldTombstones(spark, sf, idxA)
    LifecycleIndex.foldTombstones(spark, sf, idxB)
    val gotA = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idxA))
    val gotB = edgeSet(LifecycleIndex.maintainedEdges(spark, sf, idxB))
    PersistRegistry.release()
    assert(gotA === gotB,
      "crash + interleaved delete epoch + retry must converge to " +
      "the clean-fold index (no minted repair edges)")
  }

  test("overwriteFrom is an optimistic CAS: an interleaved commit " +
      "makes the pinned overwrite throw instead of clobbering") {
    import spark.implicits._
    val tab = tmp("graft-cas-") + "/t"
    SnapshotTable.overwrite(spark, Seq(1L).toDF("x"), tab)
    val captured = SnapshotTable.currentVersionOf(tab)
    // interleaved epoch commits between capture and the fold's write
    SnapshotTable.append(spark, Seq(2L).toDF("x"), tab)
    val e = intercept[IllegalStateException] {
      SnapshotTable.overwriteFrom(spark, Seq(3L).toDF("x"), tab,
        captured)
    }
    // round-17: a stale pin is refused up front with a distinct
    // message (before the claim — the slot may have been vacated by a
    // vacuum, where the old collision path would silently regress
    // CURRENT); the contract is the same loud no-clobber failure
    assert(e.getMessage.contains("stale"))
    // the interleaved commit's rows are intact
    assert(SnapshotTable.read(spark, tab).count() === 2L)
    // and the CAS succeeds when pinned to the TRUE current version
    SnapshotTable.overwriteFrom(spark, Seq(3L).toDF("x"), tab,
      SnapshotTable.currentVersionOf(tab))
    assert(SnapshotTable.read(spark, tab)
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
  }
}
