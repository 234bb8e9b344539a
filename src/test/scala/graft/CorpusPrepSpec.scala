package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusPrep
import graft.sources.Tables

/** End-to-end invariants of the composed corpus-preparation pipeline:
  * metric reconciliation, dedup/split/decontamination guarantees, and
  * the next-fit packing bound — plus full determinism under
  * repartitioning.
  */
class CorpusPrepSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val prep = CorpusPrep.prepare(spark, docs)
  private lazy val train = prep.train.collect()
  private lazy val valid = prep.valid.collect()
  private lazy val test = prep.test.collect()

  test("quality metrics reconcile and splits are disjoint + exhaustive") {
    val _ = (train, valid, test) // consume so the observation resolves
    val m = prep.metrics.get
    assert(m("n_total").asInstanceOf[Long] ===
      m("n_kept").asInstanceOf[Long] + m("n_null").asInstanceOf[Long] +
        m("n_too_short").asInstanceOf[Long] +
        m("n_too_repetitive").asInstanceOf[Long])
    val ids = train.map(_.getLong(0)) ++ valid.map(_.getLong(0)) ++
      test.map(_.getLong(0))
    assert(ids.distinct.length === ids.length, "splits overlap")
  }

  test("no duplicated content survives across any split") {
    val texts = train.map(_.getString(1)) ++ valid.map(_.getString(1)) ++
      test.map(_.getString(1))
    assert(texts.distinct.length === texts.length)
  }

  test("train shares no 32-char gram with test (decontaminated)") {
    def grams(t: String) =
      (0 to t.length - 32 by 16).map(i => t.substring(i, i + 32)).toSet
    val testGrams = test.map(_.getString(1)).filter(_.length >= 32)
      .flatMap(grams).toSet
    val leaked = train.map(r => r.getLong(0) -> r.getString(1))
      .filter(_._2.length >= 32)
      .filter { case (_, t) => grams(t).exists(testGrams) }
    assert(leaked.isEmpty, s"contaminated train docs: ${leaked.map(_._1).toSeq}")
  }

  test("next-fit packing bound: every pack fits budget + one document") {
    val byPack = train.map(r => (r.getLong(3), r.getLong(2)))
      .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2) }
    val maxDoc = train.map(_.getLong(2)).max
    for ((pack, toks) <- byPack) {
      assert(toks.sum <= 2048 + maxDoc,
        s"pack $pack holds ${toks.sum} tokens")
    }
    // multi-doc packs exist (the packer actually packs)
    assert(byPack.values.exists(_.size > 1))
  }

  test("save writes splits + a manifest that matches a reloaded checksum") {
    val dir = java.nio.file.Files.createTempDirectory("prep_out")
    val manifest = CorpusPrep.save(prep, dir.toString)
    assert(manifest("train_rows") === train.length.toLong)
    // manifest is reproducible from the saved artifact alone
    val reloaded = CorpusPrep.prepare(spark,
      Tables.documents(spark, sf).repartition(9))
    val dir2 = java.nio.file.Files.createTempDirectory("prep_out2")
    val manifest2 = CorpusPrep.save(reloaded, dir2.toString)
    assert(manifest === manifest2, "manifests differ across identical reruns")
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifest.json")), "UTF-8")
    assert(onDisk.contains(s""""train_checksum":${manifest("train_checksum")}"""))
  }

  test("save works on a SCHEME-addressed output dir (round-20 " +
      "review): the splits already landed wherever Spark writes, " +
      "but the manifest was a java.nio write that threw on a " +
      "store-shaped dir — after the data was written") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val local = java.nio.file.Files.createTempDirectory("prep_scheme")
    val manifest = CorpusPrep.save(prep, "graftfs:" + local)
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$local/manifest.json")), "UTF-8")
    assert(onDisk.contains(
      s""""train_checksum":${manifest("train_checksum")}"""))
    // the split parquet landed under the schemed dir too
    assert(spark.read.parquet(s"graftfs:$local/train").count() ===
      manifest("train_rows"))
  }

  test("streaming gate+dedup over a file source equals the batch front half") {
    // batch truth: same gate, then keep ONE doc per content hash
    val batchIds = graft.functions.QualityGate
      .filterStream(docs).dropDuplicates("text")
      .select("text").collect().map(_.getString(0)).toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("prep_stream")
    docs.write.parquet(s"$dir/in/chunk0")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
    val q = CorpusPrep.gateAndDedupStream(stream)
      .writeStream.format("memory").queryName("prep_stream_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamedTexts = spark.table("prep_stream_test")
      .select("text").collect().map(_.getString(0)).toSet
    // first-arrival dedup keeps a different REPRESENTATIVE than
    // min-doc_id dedup may, but the surviving CONTENT set is identical
    assert(streamedTexts === batchIds)
  }

  test("the pipeline is deterministic under repartitioning") {
    val again = CorpusPrep.prepare(spark, docs.repartition(7))
    val a = again.train.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = prep.train.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
