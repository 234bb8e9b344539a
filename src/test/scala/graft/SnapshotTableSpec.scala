package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.warehouse.SnapshotTable

/** Snapshot semantics of the versioned warehouse: append/overwrite
  * atomicity, time travel, reader isolation, and compaction.
  */
class SnapshotTableSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir = java.nio.file.Files
    .createTempDirectory("snap").toString

  test("append versions accumulate; every old snapshot stays readable") {
    val dir = freshDir
    val docs = Tables.documents(spark, sf)
    val (a, b) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    val v0 = SnapshotTable.append(spark, a, dir)
    val v1 = SnapshotTable.append(spark, b, dir)
    assert(v0 === 0 && v1 === 1)
    assert(SnapshotTable.read(spark, dir).count() === docs.count())
    // time travel: version 0 is exactly the first append
    assert(SnapshotTable.read(spark, dir, 0).count() === a.count())
  }

  test("overwrite replaces the live set but keeps old snapshots") {
    val dir = freshDir
    val docs = Tables.documents(spark, sf)
    SnapshotTable.append(spark, docs, dir)
    SnapshotTable.overwrite(spark, docs.limit(10), dir)
    assert(SnapshotTable.read(spark, dir).count() === 10)
    assert(SnapshotTable.read(spark, dir, 0).count() === docs.count())
    assert(SnapshotTable.versions(dir) === Seq(0, 1))
  }

  test("a reader's snapshot is isolated from a commit made after it") {
    val dir = freshDir
    val docs = Tables.documents(spark, sf)
    SnapshotTable.append(spark, docs, dir)
    val snapshot = SnapshotTable.read(spark, dir) // file list fixed NOW
    SnapshotTable.overwrite(spark, docs.limit(1), dir)
    // the pre-commit reader still sees its full version
    assert(snapshot.count() === docs.count())
    assert(SnapshotTable.read(spark, dir).count() === 1)
  }

  test("upsert replaces matched keys and inserts the rest atomically") {
    import spark.implicits._
    val dir = freshDir
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    SnapshotTable.append(spark, base, dir)
    val changes = Seq((2L, "B2"), (4L, "d")).toDF("id", "v")
    SnapshotTable.upsert(spark, changes, dir, Seq("id"))
    val now = SnapshotTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(now === Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d"))
    // pre-merge snapshot unchanged
    val before = SnapshotTable.read(spark, dir, 0).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before === Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("incremental per-date ingest equals a batch build (no rebuild)") {
    // the reference deletes and rebuilds its whole DB every run
    // (main.py:283-284); versioned appends make ingestion incremental
    val dir = freshDir
    val parsed = graft.boatrace.BoatracePipeline
      .parseDir(spark, "/root/reference/txt")
    val race = graft.boatrace.BoatracePipeline.typedRace(
      graft.boatrace.BoatracePipeline.raceTable(
        graft.boatrace.BoatracePipeline.envDf(spark, parsed),
        graft.boatrace.BoatracePipeline.resultDf(spark, parsed),
        graft.boatrace.BoatracePipeline.scheduleDf(spark, parsed)))
      .filter(col("date").between("2020-08-01", "2020-08-03"))
      .persist()
    val dates = Seq("2020-08-01", "2020-08-02", "2020-08-03")
    for (d <- dates)
      SnapshotTable.append(spark, race.filter(col("date") === d), dir)
    val incremental = SnapshotTable.read(spark, dir)
      .orderBy("レースID", "艇番").collect()
    val batch = race.orderBy("レースID", "艇番").collect()
    assert(incremental.toSeq === batch.toSeq)
    // and each day's snapshot holds exactly the days ingested so far
    assert(SnapshotTable.read(spark, dir, 0).select("date").distinct()
      .count() === 1)
    race.unpersist()
  }

  test("vacuum deletes files only expired snapshots reference, and " +
      "the per-version metas — the streaming exactly-once ledger — " +
      "survive the sweep") {
    import spark.implicits._
    val dir = freshDir
    SnapshotTable.append(spark, Seq((1L, "a")).toDF("id", "v"), dir,
      Some("ins:batch=7"))
    SnapshotTable.overwrite(spark, Seq((2L, "b")).toDF("id", "v"), dir)
    val deleted = SnapshotTable.vacuum(dir, keepVersions = 1)
    assert(deleted > 0, "v0's files should have been removed")
    // current snapshot intact, expired one gone
    assert(SnapshotTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "b")))
    intercept[Exception] {
      SnapshotTable.read(spark, dir, 0).collect()
    }
    // the vacuumed epoch's ledger line is still visible — a late
    // re-delivered streaming epoch must keep skipping after ANY
    // retention policy runs (a vacuum that dropped metas would
    // silently reopen the double-append window)
    assert(SnapshotTable.committedMetas(dir).contains("ins:batch=7"),
      "vacuum must retain per-version .meta files")
  }

  test("newestMetas walks the ledger newest-first; newestLedgerId is " +
      "the highest applied epoch under a prefix, skipping unparseable " +
      "suffixes and meta-less maintenance commits") {
    import spark.implicits._
    val dir = freshDir
    val df = Seq((1L, "a")).toDF("id", "v")
    SnapshotTable.append(spark, df, dir, Some("ins:batch=0"))
    SnapshotTable.append(spark, df, dir, Some("del:batch=0"))
    SnapshotTable.append(spark, df, dir, Some("ins:batch=3"))
    // a meta-less maintenance commit on top (compact/overwrite): the
    // pointer carries no inline meta, the walk must keep descending
    SnapshotTable.overwrite(spark, df, dir)
    assert(SnapshotTable.newestMetas(dir).toSeq ===
      Seq("ins:batch=3", "del:batch=0", "ins:batch=0"))
    // newest matching line decides, per-stream prefixes independent
    assert(SnapshotTable.newestLedgerId(dir, "ins:batch=") === Some(3L))
    assert(SnapshotTable.newestLedgerId(dir, "del:batch=") === Some(0L))
    assert(SnapshotTable.newestLedgerId(dir, "nope:") === None)
    // a prefix-matching line with a garbage suffix is skipped — the
    // scan continues to the next parseable ledger line
    SnapshotTable.append(spark, df, dir, Some("ins:batch=oops"))
    assert(SnapshotTable.newestLedgerId(dir, "ins:batch=") === Some(3L))
    // the exactly-once check this feeds: epoch 3 re-delivered skips,
    // epoch 4 does not
    assert(SnapshotTable.newestLedgerId(dir, "ins:batch=").exists(_ >= 3L))
    assert(!SnapshotTable.newestLedgerId(dir, "ins:batch=").exists(_ >= 4L))
  }

  test("compaction rewrites many small files into one, row-identical") {
    val dir = freshDir
    val docs = Tables.documents(spark, sf)
    // 5 small appends -> many files
    docs.collect().grouped(100).zipWithIndex.foreach { case (chunk, _) =>
      SnapshotTable.append(spark,
        spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toIndexedSeq, 2), docs.schema),
        dir)
    }
    val before = SnapshotTable.read(spark, dir)
    val filesBefore = before.inputFiles.length
    val rowsBefore = before.orderBy("doc_id").collect().toSeq
    val v = SnapshotTable.compact(spark, dir)
    val after = SnapshotTable.read(spark, dir)
    assert(after.inputFiles.length === 1)
    assert(after.inputFiles.length < filesBefore)
    assert(after.orderBy("doc_id").collect().toSeq === rowsBefore)
    // the pre-compaction snapshot still reads the small files
    assert(SnapshotTable.read(spark, dir, v - 1).inputFiles.length === filesBefore)
  }

  test("racing overwrite commits serialize on the manifest claim — " +
      "every commit gets a distinct version, no manifest is clobbered") {
    val dir = freshDir
    val docs = Tables.documents(spark, sf).limit(20)
    // seed v0 so racers contend on an existing CURRENT
    SnapshotTable.append(spark, docs, dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // the table is single-writer BY CONTRACT; this exercises the
    // violated contract: base-independent commits (overwrite) must
    // re-version via the CREATE_NEW manifest claim, never clobber
    val racers = (1 to 4).map { i =>
      Future(SnapshotTable.overwrite(spark, docs.limit(i), dir))
    }
    val versions = racers.map(f => Await.result(f, 120.seconds))
    assert(versions.distinct.size === versions.size,
      s"two commits stamped the same version: $versions")
    // every stamped manifest exists, each with its own file list, and
    // CURRENT points at a committed version
    val vd = java.nio.file.Paths.get(dir, "_versions")
    versions.foreach { v =>
      assert(java.nio.file.Files.exists(vd.resolve(f"v$v%05d.manifest")))
      // which racer claimed which version is scheduling-dependent,
      // but every claimed version must read back as one racer's frame
      assert((1L to 4L).contains(SnapshotTable.read(spark, dir, v).count()))
    }
    assert(SnapshotTable.read(spark, dir).count() > 0)
  }
}
