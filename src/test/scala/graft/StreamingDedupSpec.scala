package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.StreamingDedup
import graft.warehouse.SnapshotTable

/** Streaming dedup-at-the-gate: documents arrive in waves; at every
  * point the accepted corpus must be free of confirmed near-dup pairs,
  * every drop must be justified by a real near-dup relation, and
  * epoch re-delivery must be a no-op.
  */
class StreamingDedupSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  /** Confirmed near-dup pairs (d02 semantics) over a sig table. */
  private def confirmedPairs(sigs: DataFrame): DataFrame = {
    val bands = sigs
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(3))).as("b"), col("sig"))
      .select(col("doc_id"), col("b"),
        concat(element_at(col("sig"), col("b") * 2 + 1).cast("string"),
          lit(":"),
          element_at(col("sig"), col("b") * 2 + 2).cast("string")).as("key"))
    val a = bands.select(col("b").as("ab"), col("key").as("ak"),
      col("doc_id").as("doc_a"))
    val c = bands.select(col("b").as("cb"), col("key").as("ck"),
      col("doc_id").as("doc_b"))
    a.join(c, col("ab") === col("cb") && col("ak") === col("ck") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .join(sigs.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
      .filter(size(array_intersect(col("sa"), col("sb"))).cast("double")
        / size(array_union(col("sa"), col("sb"))) >= 0.5)
      .select("doc_a", "doc_b")
  }

  test("gate ingest over 3 waves: corpus near-dup-free, drops justified") {
    val in = tmp("graft-sdedup-in-")
    val corpusDir = tmp("graft-sdedup-state-")
    val ckpt = tmp("graft-sdedup-ckpt-")
    val stage = tmp("graft-sdedup-stage-")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val total = docs.count()

    val q = StreamingDedup.start(spark, in, corpusDir, ckpt)
    try {
      (0 until 3).foreach { wave =>
        // stage the wave then MOVE the part files into the watched dir
        // (writing in place would race the stream against the committer)
        val sdir = s"$stage/w$wave"
        docs.filter(col("doc_id") % 3 === wave)
          .coalesce(1).write.mode("overwrite").parquet(sdir)
        Files.list(Paths.get(sdir)).iterator()
          .forEachRemaining { f =>
            if (f.getFileName.toString.endsWith(".parquet"))
              Files.move(f, Paths.get(in, s"w$wave.parquet"))
          }
        q.processAllAvailable()
        // the invariant holds at EVERY commit, not only at the end
        val sigsNow = SnapshotTable.read(spark, s"$corpusDir/sigs")
        assert(confirmedPairs(sigsNow).count() === 0L,
          s"near-dup pair inside the accepted corpus after wave $wave")
      }
    } finally q.stop()

    val corpus = StreamingDedup.corpus(spark, corpusDir)
    val keptIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.subsetOf(allIds))
    val dropped = allIds -- keptIds
    assert(dropped.nonEmpty, "nothing was deduped — planted dups missed")
    // every drop is justified: the dropped doc appears in the FULL
    // corpus's confirmed near-dup pair relation (same deterministic
    // LSH + confirm pipeline as the batch d02 operator)
    val pairEndpoints = SparkEntry.queries("d02_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    PersistRegistry.release()
    assert(dropped.subsetOf(pairEndpoints),
      s"unjustified drops: ${(dropped -- pairEndpoints).take(5)}")
    // and no confirmed pair survived with both endpoints accepted
    SparkEntry.queries("d02_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect().foreach { r =>
        assert(!(keptIds(r.getLong(0)) && keptIds(r.getLong(1))),
          s"pair (${r.getLong(0)}, ${r.getLong(1)}) fully accepted")
      }
    PersistRegistry.release()
  }

  test("maintenance compaction: rows identical, one file, ledger kept") {
    val corpusDir = tmp("graft-sdedup-compact-")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // two epochs of disjoint docs → each table holds >= 2 data files
    StreamingDedup.ingestBatch(spark,
      docs.filter(col("doc_id") % 2 === 0).limit(30), corpusDir, 0L)
    StreamingDedup.ingestBatch(spark,
      docs.filter(col("doc_id") % 2 === 1).limit(30), corpusDir, 1L)
    def manifestFiles(tab: String): Seq[String] = {
      val vd = Paths.get(s"$corpusDir/$tab", "_versions")
      val cur = new String(Files.readAllBytes(vd.resolve("CURRENT")))
        .trim.split("\\s+").head.toInt
      Files.readAllLines(vd.resolve(f"v$cur%05d.manifest"))
        .toArray.map(_.toString).toSeq.filter(_.nonEmpty)
    }
    assert(manifestFiles("corpus").size >= 2, "setup: expected >=2 files")
    val before = StreamingDedup.corpus(spark, corpusDir)
      .collect().map(_.toSeq.toString).sorted.toSeq
    val ledgerBefore = SnapshotTable.currentMeta(s"$corpusDir/corpus")
    assert(ledgerBefore === Some("batch=1"))
    StreamingDedup.maintain(spark, corpusDir)
    val after = StreamingDedup.corpus(spark, corpusDir)
      .collect().map(_.toSeq.toString).sorted.toSeq
    assert(after === before, "compaction changed rows")
    assert(manifestFiles("corpus").size === 1, "not compacted to one file")
    // the ledger survives compaction — a retried epoch 1 is STILL a no-op
    assert(SnapshotTable.currentMeta(s"$corpusDir/corpus") === ledgerBefore)
    StreamingDedup.ingestBatch(spark,
      docs.filter(col("doc_id") % 2 === 1).limit(30), corpusDir, 1L)
    assert(StreamingDedup.corpus(spark, corpusDir).count() ===
      before.size.toLong)
  }

  test("replayed gate epoch is a no-op; new epoch appends") {
    val corpusDir = tmp("graft-sdedup-replay-")
    val batch = Tables.documents(spark, sf)
      .select("doc_id", "text").limit(40)
    StreamingDedup.ingestBatch(spark, batch, corpusDir, batchId = 0L)
    val rows1 = StreamingDedup.corpus(spark, corpusDir).count()
    val v1 = SnapshotTable.versions(s"$corpusDir/corpus").last
    StreamingDedup.ingestBatch(spark, batch, corpusDir, batchId = 0L)
    assert(StreamingDedup.corpus(spark, corpusDir).count() === rows1)
    assert(SnapshotTable.versions(s"$corpusDir/corpus").last === v1)
    // the same docs arriving as a NEW epoch are all duplicates of the
    // corpus now — the gate drops every one of them
    StreamingDedup.ingestBatch(spark, batch, corpusDir, batchId = 1L)
    assert(StreamingDedup.corpus(spark, corpusDir).count() === rows1)
  }

  test("a crash between the two state appends + a FOREIGN meta-less " +
      "compact: the retry completes the sigs index WITHOUT " +
      "re-appending the corpus (round 20: the skip reads the durable " +
      "ledger, not the pointer meta maintain() preserves)") {
    val corpusDir = tmp("graft-sdedup-cpt-")
    val batch = Tables.documents(spark, sf)
      .select("doc_id", "text").limit(40)
    val n = batch.count()
    // the gate is deterministic: a clean ingest of the same batch
    // names the survivor count the retry must reproduce
    val cleanDir = tmp("graft-sdedup-cpt-clean-")
    StreamingDedup.ingestBatch(spark, batch, cleanDir, batchId = 0L)
    val expectedSigs = SnapshotTable.read(spark, s"$cleanDir/sigs").count()
    // the partial-apply state a crash between appendOnce(corpus) and
    // appendOnce(sigs) leaves behind: corpus committed under epoch
    // 0's ledger line, sigs table not yet created. The dedup gate
    // consults ONLY the sigs index, so the retry recomputes the SAME
    // survivors — the corpus skip is what stands between it and
    // doubled rows.
    SnapshotTable.append(spark, batch, s"$corpusDir/corpus",
      Some("batch=0"))
    // ...and an operator compacts the corpus meta-less before the
    // retry lands: the pointer no longer names epoch 0, only the
    // durable v0 ledger line does
    SnapshotTable.compact(spark, s"$corpusDir/corpus")
    assert(SnapshotTable.currentMeta(s"$corpusDir/corpus").isEmpty)
    StreamingDedup.ingestBatch(spark, batch, corpusDir, batchId = 0L)
    assert(StreamingDedup.corpus(spark, corpusDir).count() === n,
      "corpus re-appended behind a meta-less compact")
    assert(SnapshotTable.read(spark, s"$corpusDir/sigs").count() ===
      expectedSigs, "the retry must still complete the missing sigs append")
  }
}
