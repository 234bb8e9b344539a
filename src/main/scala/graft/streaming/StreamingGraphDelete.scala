package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.warehouse.SnapshotTable

/** Online graph-index deletion — the streaming form of v23 and the
  * missing half of online maintenance (StreamingGraphInsert covers
  * arrivals; a production vector store also RETIRES vectors
  * continuously). Tombstone ids arrive as a file stream; each
  * micro-batch appends them to a durable tombstone table and
  * republishes the maintained edge table as v23's prune + local
  * repair of the committed base graph against the CUMULATIVE
  * tombstone set.
  *
  * Correctness hinge (why recompute-from-cumulative, not
  * prune-incrementally): the repair rule is GLOBAL over the delete
  * set — each survivor keeps its top-3 repair candidates across ALL
  * pairs induced by deleted neighbors, and a later wave's deletions
  * both prune earlier repairs and change which candidates rank
  * top-3. Applying waves incrementally is therefore order-dependent;
  * recomputing from (base graph, cumulative tombstones) makes each
  * epoch's table a pure function of the tombstone SET, so the
  * drained stream is row-identical to the one-shot batch delete
  * under any micro-batching (StreamingGraphDeleteSpec pins it
  * against v23's oracle-checked rule).
  *
  * Exactly-once: the epoch id rides each commit's durable meta
  * (SnapshotTable.committedMetas — the full ledger, not just the
  * CURRENT pointer). A re-delivered epoch that already reached the
  * edge commit is skipped outright; one that crashed between the
  * tombstone append and the edge overwrite skips the append and
  * redoes the (idempotent, derived) overwrite.
  *
  * Scale: per-epoch cost is the prune (two anti joins over the edge
  * table) plus O(|D_cum|·deg²) repair pairs — everything keyed and
  * distributed, NOTHING collected to the driver at any batch size
  * (deletes, unlike inserts, need no coordinator walk). Repair cost
  * grows with the cumulative tombstone count; a production
  * deployment periodically compacts tombstones into the base
  * snapshot (a scheduled rebuild, amortized across epochs) exactly
  * as table formats fold delete vectors into data files — the
  * per-epoch path stays rebuild-free.
  */
object StreamingGraphDelete {

  /** Per-epoch tombstone budget: deletes never materialize on the
    * driver, but one epoch's arrivals should be a bounded intake
    * unit (the same contract as the insert side); a misconfigured
    * source fails loudly here. */
  val EpochCap = 4096

  /** Watch `delsDir` for parquet files of (vec_id) tombstones and
    * maintain `indexDir/edges` + `indexDir/deleted`. `d` is the
    * corpus dir holding the committed vectors + full graph. */
  def start(spark: SparkSession, delsDir: String, d: String,
      indexDir: String, checkpointDir: String): StreamingQuery = {
    val schema = StructType(Seq(StructField("vec_id", LongType)))
    spark.readStream.schema(schema).parquet(delsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        deleteEpoch(spark, batch, d, indexDir, batchId)
      }
      .start()
  }

  /** One epoch: append the batch to the tombstone table, then
    * republish the maintained edges as prune+repair of the base
    * graph against ALL tombstones so far. Public so the spec and a
    * batch backfill drive the exact streaming code path. */
  def deleteEpoch(spark: SparkSession, batch: DataFrame, d: String,
      indexDir: String, batchId: Long): Unit = {
    val edgesTab = s"$indexDir/edges"
    val delTab = s"$indexDir/deleted"
    val ledgerLine = s"batch=$batchId"
    // fully applied already? (edge overwrite is the epoch's LAST
    // commit, so its ledger entry certifies the whole epoch)
    if (SnapshotTable.committedMetas(edgesTab).contains(ledgerLine))
      return
    // distributed pre-check — bounded intake, no driver collect
    val n = batch.limit(EpochCap + 1).count()
    if (n == 0) return
    require(n <= EpochCap,
      s"streaming delete epoch exceeds the $EpochCap-tombstone intake " +
      "budget — size maxFilesPerTrigger so each micro-batch fits")
    // tombstone append (skipped on a retry that already got here)
    if (!SnapshotTable.committedMetas(delTab).contains(ledgerLine))
      SnapshotTable.append(spark, batch.select("vec_id"), delTab,
        Some(ledgerLine))
    // republish: a pure derivation of (base graph, cumulative
    // tombstones) — idempotent, so a crashed epoch's retry lands the
    // identical table
    val del = SnapshotTable.read(spark, delTab)
      .select(col("vec_id").as("del_id")).distinct()
    val repaired = graft.operators.SimilarityQueries
      .streamDeleteEdges(spark, d, del)
    SnapshotTable.overwrite(spark, repaired, edgesTab, Some(ledgerLine))
    ()
  }
}
