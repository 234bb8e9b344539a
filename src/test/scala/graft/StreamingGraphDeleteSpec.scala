package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingGraphDelete
import graft.warehouse.SnapshotTable

/** Streaming graph-index DELETION ≡ batch (round 13, the missing
  * half of online maintenance): tombstone ids arrive as a file
  * stream in micro-batches; the maintained edge table after the
  * stream drains must equal v23's one-shot prune + local repair
  * row-for-row — the graph that v23's oracle-checked search walks.
  * Exact under ANY micro-batching because each epoch republishes
  * from the CUMULATIVE tombstone set (the repair top-3 is a global
  * rule over the whole delete set, so per-wave incremental repair
  * would be order-dependent). Also pins: no deleted endpoint
  * survives, a re-delivered epoch is a no-op even after an
  * interleaved meta-less compact (the durable per-version ledger,
  * round-12 advice), and an oversized epoch fails loudly from the
  * distributed pre-check.
  */
class StreamingGraphDeleteSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  test("file-streamed deletes maintain the same edge table as the " +
      "one-shot v23 prune+repair; ledger survives a compact") {
    val in = tmp("graft-sgd-in-")
    val idx = tmp("graft-sgd-idx-")
    val ck = tmp("graft-sgd-ck-")
    // v23's fixture delete batch (every 97th vec_id), in 3 waves
    val dels = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 97 === 0)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(dels.length >= 3, "need enough tombstones to micro-batch")
    dels.grouped(math.max(dels.length / 3, 1)).zipWithIndex
      .foreach { case (chunk, i) =>
        import spark.implicits._
        chunk.toSeq.toDF("vec_id").coalesce(1)
          .write.parquet(s"$in/wave_$i")
      }
    val q = StreamingGraphDelete.start(spark, s"$in/*", sf, idx, ck)
    try q.processAllAvailable() finally q.stop()
    PersistRegistry.release()

    val edgesTab = s"$idx/edges"
    val streamed = SnapshotTable.read(spark, edgesTab)
      .select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val batch = graft.operators.SimilarityQueries
      .deleteRepairedGraph(spark, sf)
      .select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    PersistRegistry.release()
    assert(streamed === batch,
      "stream-maintained edges must equal the one-shot prune+repair")

    // no deleted endpoint survives in the maintained graph
    val delSet = dels.toSet
    assert(!streamed.exists { case (u, w) => delSet(u) || delSet(w) },
      "a tombstoned id survived as a graph endpoint")

    // exactly-once across an interleaved meta-less commit: a compact
    // moves the CURRENT pointer and drops its meta, so the pointer-
    // only check would re-apply a late re-delivered epoch; the
    // durable per-version ledger must still recognize it
    val lastId = SnapshotTable.committedMetas(edgesTab)
      .flatMap("batch=(\\d+)".r.findFirstMatchIn(_)).map(_.group(1).toLong)
      .max
    SnapshotTable.compact(spark, edgesTab)
    val versionsBefore = SnapshotTable.versions(edgesTab).size
    val lastWave = spark.read.parquet(s"$in/wave_2")
    StreamingGraphDelete.deleteEpoch(spark, lastWave, sf, idx, lastId)
    PersistRegistry.release()
    assert(SnapshotTable.versions(edgesTab).size === versionsBefore,
      "a re-delivered epoch must be skipped by the durable ledger " +
      "even after an interleaved meta-less compact")
  }

  test("tombstone fold: nothing observable changes at fold time, the " +
      "tombstone list restarts empty, post-fold epochs are exact " +
      "against the folded base, and pre-fold re-delivery still skips") {
    import graft.operators.SimilarityQueries
    val idx = tmp("graft-sgd-fold-")
    val dels = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 97 === 0)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    val (pre, post) = dels.splitAt(dels.length * 2 / 3)
    import spark.implicits._
    // two pre-fold epochs
    pre.grouped(math.max(pre.length / 2, 1)).zipWithIndex
      .foreach { case (chunk, i) =>
        StreamingGraphDelete.deleteEpoch(spark,
          chunk.toSeq.toDF("vec_id"), sf, idx, i.toLong)
      }
    val beforeFold = SnapshotTable.read(spark, s"$idx/edges")
      .select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    StreamingGraphDelete.foldTombstones(spark, idx)
    // fold is observationally silent on the edge table
    val afterFold = SnapshotTable.read(spark, s"$idx/edges")
      .select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(afterFold === beforeFold, "a fold must not change the edges")
    assert(SnapshotTable.read(spark, s"$idx/deleted").count() === 0L,
      "the tombstone list must restart empty after a fold")
    // a pre-fold epoch re-delivered post-fold is still a no-op
    val versions = SnapshotTable.versions(s"$idx/edges").size
    StreamingGraphDelete.deleteEpoch(spark,
      pre.take(2).toSeq.toDF("vec_id"), sf, idx, 0L)
    assert(SnapshotTable.versions(s"$idx/edges").size === versions,
      "pre-fold epoch re-delivery must skip via the persistent ledger")
    // post-fold epoch: exact prune+repair against the FOLDED base
    StreamingGraphDelete.deleteEpoch(spark,
      post.toSeq.toDF("vec_id"), sf, idx, 99L)
    val got = SnapshotTable.read(spark, s"$idx/edges")
      .select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = SimilarityQueries.streamDeleteEdges(spark, sf,
        post.toSeq.toDF("vec_id").select(col("vec_id").as("del_id")),
        Some(SnapshotTable.read(spark, s"$idx/base")))
      .select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    PersistRegistry.release()
    assert(got === want,
      "post-fold epoch must equal prune+repair over the folded base")
    // no deleted id from ANY wave survives
    val delSet = dels.toSet
    assert(!got.exists { case (u, w) => delSet(u) || delSet(w) },
      "a tombstoned id reappeared after the fold")
  }

  test("an oversized delete epoch fails the distributed pre-check " +
      "before any work") {
    val idx = tmp("graft-sgd-cap-")
    val oversized = spark.range(StreamingGraphDelete.EpochCap + 1)
      .select(col("id").as("vec_id"))
    val e = intercept[IllegalArgumentException] {
      StreamingGraphDelete.deleteEpoch(spark, oversized, sf, idx, 0L)
    }
    assert(e.getMessage.contains("intake budget"))
    // nothing was committed — the epoch failed before any append
    assert(!Files.exists(java.nio.file.Paths.get(s"$idx/deleted")),
      "an over-budget epoch must not leave a partial tombstone commit")
  }
}
