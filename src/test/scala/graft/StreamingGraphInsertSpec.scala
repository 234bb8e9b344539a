package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingGraphInsert
import graft.warehouse.SnapshotTable

/** Streaming graph-index maintenance ≡ batch (round 12): the insert
  * vectors arrive as a file stream in single-file micro-batches; the
  * maintained edge table after the stream drains must equal v21's
  * one-shot batch output row-for-row — exact, not approximate,
  * because the insert rule never links insert→insert, so per-epoch
  * processing is order-independent. Also pins the exactly-once
  * ledger: re-delivering the final epoch does not double-append.
  */
class StreamingGraphInsertSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  test("file-streamed inserts build the same edge table as the " +
      "one-shot v21 batch, and a re-delivered epoch is a no-op") {
    val in = tmp("graft-sgi-in-")
    val idx = tmp("graft-sgi-idx-")
    val ck = tmp("graft-sgi-ck-")
    // the insert population, split into 3 parquet files = 3 epochs
    val inserts = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 89 === 0)
      .select("vec_id", "embedding", "label")
      .collect()
    assert(inserts.length >= 3, "need enough inserts to micro-batch")
    val schema = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding", "label").schema
    inserts.grouped(math.max(inserts.length / 3, 1)).zipWithIndex
      .foreach { case (chunk, i) =>
        spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toIndexedSeq), schema)
          .write.parquet(s"$in/wave_$i")
      }
    val q = StreamingGraphInsert.start(spark, s"$in/*", sf, idx, ck)
    try q.processAllAvailable() finally q.stop()
    PersistRegistry.release()

    val streamed = SnapshotTable.read(spark, s"$idx/edges")
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(identity)
    val batch = SparkEntry.queries("v21_graph_insert")(spark, sf)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(identity)
    PersistRegistry.release()
    assert(streamed.toSeq === batch.toSeq,
      "stream-maintained edges must equal the one-shot batch insert")

    // exactly-once: re-running the LAST epoch (same batch id and
    // meta) must not double-append
    val before = SnapshotTable.read(spark, s"$idx/edges").count()
    val lastWave = spark.read.parquet(s"$in/wave_2")
    val lastMeta = SnapshotTable.currentMeta(s"$idx/edges")
    val lastId = lastMeta.flatMap(m =>
      "batch=(\\d+)".r.findFirstMatchIn(m).map(_.group(1).toLong))
      .getOrElse(fail("edge table carries no epoch meta"))
    StreamingGraphInsert.insertEpoch(spark, lastWave, sf, idx, lastId)
    PersistRegistry.release()
    assert(SnapshotTable.read(spark, s"$idx/edges").count() === before,
      "a re-delivered epoch must be skipped by the ledger")

    // ...and still skipped after an interleaved meta-less compact:
    // the pointer's meta is gone, but the durable per-version ledger
    // (committedMetas) retains every epoch id (round-12 advice)
    SnapshotTable.compact(spark, s"$idx/edges")
    assert(SnapshotTable.currentMeta(s"$idx/edges").isEmpty,
      "compact without meta should clear the pointer meta")
    StreamingGraphInsert.insertEpoch(spark, lastWave, sf, idx, lastId)
    PersistRegistry.release()
    assert(SnapshotTable.read(spark, s"$idx/edges").count() === before,
      "a re-delivered epoch must be skipped by the durable ledger " +
      "even after an interleaved meta-less compact")
  }

  test("an oversized insert epoch fails the distributed pre-check " +
      "BEFORE the driver collect") {
    val idx = tmp("graft-sgi-cap-")
    // 4097 rows, embeddings deliberately null: the cap must fire on
    // the distributed limit-count, before any row (or its embedding)
    // is materialized driver-side — if the code collected first,
    // this batch would NPE in the quantize transform instead of
    // raising the budget error
    val oversized = spark.range(StreamingGraphInsert.EpochCap + 1)
      .select(col("id").as("vec_id"),
        lit(null).cast("array<float>").as("embedding"),
        lit(0).as("label"))
    val e = intercept[IllegalArgumentException] {
      StreamingGraphInsert.insertEpoch(spark, oversized, sf, idx, 0L)
    }
    assert(e.getMessage.contains("coordinator budget"))
  }
}
