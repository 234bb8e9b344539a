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
    // post-fold tombstones) — idempotent, so a crashed epoch's retry
    // lands the identical table. The base is the FOLDED edge table
    // when a compaction has run (see foldTombstones), else the
    // committed full-corpus graph.
    val del = SnapshotTable.read(spark, delTab)
      .select(col("vec_id").as("del_id")).distinct()
    val repaired = graft.operators.SimilarityQueries
      .streamDeleteEdges(spark, d, del, foldedBase(spark, indexDir))
    SnapshotTable.overwrite(spark, repaired, edgesTab, Some(ledgerLine))
    ()
  }

  private def foldedBase(spark: SparkSession,
      indexDir: String): Option[DataFrame] = {
    val baseTab = s"$indexDir/base"
    if (java.nio.file.Files.exists(
        java.nio.file.Paths.get(baseTab, "_versions", "CURRENT")))
      Some(SnapshotTable.read(spark, baseTab))
    else None
  }

  /** TOMBSTONE FOLD — the compaction that keeps the per-epoch repair
    * cost bounded: the cumulative tombstone set grows forever and
    * each epoch's repair is O(|D_cum|·deg²), so a long-lived index
    * periodically FOLDS the maintained state into a new base — the
    * current (already prune+repaired) edge table becomes the prune
    * target for future epochs and the tombstone list restarts empty.
    * Exactly the pattern by which table formats fold delete vectors
    * into data files: a scheduled rewrite, amortized across epochs,
    * leaving the per-epoch path rebuild-free.
    *
    * Semantics: the fold CHANGES NOTHING observable at fold time
    * (the edge table's rows are untouched — spec-pinned); post-fold
    * epochs are exact w.r.t. the FOLDED base (prune+repair is
    * recomputed from it), which differs from never-folding only in
    * that pre-fold repair edges are now first-class base edges
    * rather than re-derived each epoch — the compaction contract,
    * not an approximation of it.
    *
    * Exactly-once survives the fold: per-version `.meta` ledger
    * files persist through overwrites (committedMetas scans ALL
    * versions), so a re-delivered pre-fold epoch still skips both
    * the tombstone append and the edge republish. */
  def foldTombstones(spark: SparkSession, indexDir: String): Unit = {
    val edgesTab = s"$indexDir/edges"
    val delTab = s"$indexDir/deleted"
    val baseTab = s"$indexDir/base"
    val edges = SnapshotTable.read(spark, edgesTab)
      .select("vec_id", "neighbor_id")
    // the fold ledger records WHICH epoch's state became the base
    val through = SnapshotTable.committedMetas(edgesTab).lastOption
      .map(m => s"folded-$m")
    SnapshotTable.overwrite(spark, edges, baseTab, through)
    import spark.implicits._
    // repartition(1) forces one write task so the empty tombstone
    // table still commits a (0-row) data file — a fileless manifest
    // would make the next epoch's read throw
    SnapshotTable.overwrite(spark,
      Seq.empty[Long].toDF("vec_id").repartition(1), delTab, through)
    ()
  }
}
