package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-8 operators: m05 frame-fingerprint media dedup and p12
  * curriculum ordering. Semantic properties beyond the value oracle.
  */
class Round8OperatorsSpec extends AnyFunSuite {
  import TestSpark._

  test("m05: pairs are canonical, bounded, and over eligible media only") {
    val pairs = SparkEntry.queries("m05_frame_dedup")(spark, sf).collect()
    PersistRegistry.release()
    assert(pairs.nonEmpty) // the corpus plants near-duplicates
    val eligible = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 128)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for (r <- pairs) {
      val (a, b, n) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(a < b)                      // each pair reported once
      assert(n >= 1 && n <= 4)           // 4 sampled frames per media
      assert(eligible(a) && eligible(b)) // short payloads are ineligible
    }
  }

  test("m05: frame-sharing pairs land inside the shingle near-dup space") {
    // a shared aligned 32-byte frame implies heavy shingle overlap —
    // every m05 pair must also be found by d04's n-gram Jaccard >= 0.5
    val m05 = SparkEntry.queries("m05_frame_dedup")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    PersistRegistry.release()
    val d04 = SparkEntry.queries("d04_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    PersistRegistry.release()
    assert(m05.nonEmpty)
    assert(m05.subsetOf(d04),
      s"m05 pairs not confirmed by d04: ${m05.diff(d04)}")
  }

  test("p12: phases partition the corpus and pos is dense per (phase, shard)") {
    val rows = SparkEntry.queries("p12_curriculum_order")(spark, sf).collect()
    PersistRegistry.release()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length.toLong === nDocs) // ordering covers every document
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // pos is 1..n with no gaps inside each (phase, shard) stream
    rows.groupBy(r => (r.getInt(2), r.getLong(3))).foreach {
      case ((phase, shard), grp) =>
        assert(phase >= 0 && phase <= 3 && shard >= 0 && shard <= 7)
        val ps = grp.map(_.getLong(4)).sorted
        assert(ps.toSeq === (1L to grp.length).toSeq,
          s"non-dense pos in phase=$phase shard=$shard")
    }
  }

  test("v19: unbounded-query ANN join — dense ranks, ordered sims, decile-0 queries") {
    val rows = SparkEntry.queries("v19_ann_join")(spark, sf).collect()
    PersistRegistry.release()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def decile(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (qid, grp) =>
      assert(decile(qid) === 0L)       // the query table is the md5-decile-0 slice
      val sorted = grp.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to grp.length))  // dense ranks
      assert(sorted.length <= 3)
      val sims = sorted.map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })  // ordered
      grp.foreach(r => assert(decile(r.getLong(1)) !== 0L))  // corpus side only
    }
  }

  test("p13: the cut never exceeds the per-stream quota and keeps md5-order prefixes") {
    val rows = SparkEntry.queries("p13_token_budget_cut")(spark, sf).collect()
    PersistRegistry.release()
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf).count()
    assert(rows.length < total) // the budget actually cuts
    rows.groupBy(r => (r.getString(1), r.getLong(2))).foreach {
      case (_, grp) =>
        // inclusive running sum capped at the 800 div 8 = 100 quota
        assert(grp.map(_.getLong(3)).sum <= 100L)
        assert(grp.map(_.getLong(4)).max <= 100L)
    }
  }

  test("p14: pack emission reconciles with p03's assignment and conserves tokens") {
    val packs = SparkEntry.queries("p14_pack_emit")(spark, sf).collect()
    PersistRegistry.release()
    val p03 = SparkEntry.queries("p03_pack_sequences")(spark, sf).collect()
    PersistRegistry.release()
    // identical pack universe, identical membership counts
    val fromP03 = p03.groupBy(_.getLong(2)).view.mapValues(_.length.toLong).toMap
    val fromP14 = packs.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromP14 === fromP03)
    // every corpus token lands in exactly one pack
    val corpusTokens = Tables.documents(spark, sf)
      .select(size(split(trim(col("text")), "\\s+")).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(packs.map(_.getLong(2)).sum === corpusTokens)
    // fingerprints are well-formed and distinct (packs differ in content)
    val sigs = packs.map(_.getString(4))
    assert(sigs.forall(_.matches("[0-9a-f]{32}")))
    assert(sigs.distinct.length === sigs.length)
  }

  test("p12: phase ordering tracks the quality signal") {
    val rows = SparkEntry.queries("p12_curriculum_order")(spark, sf)
      .select("qscore", "phase").collect()
    PersistRegistry.release()
    // every doc in a lower phase has a strictly lower score band than
    // any doc in a higher phase (threshold banding, not quantiles)
    val maxByPhase = rows.groupBy(_.getInt(1))
      .map { case (p, g) => p -> g.map(_.getLong(0)).max }
    val minByPhase = rows.groupBy(_.getInt(1))
      .map { case (p, g) => p -> g.map(_.getLong(0)).min }
    for (p <- 0 to 2 if maxByPhase.contains(p) && minByPhase.contains(p + 1))
      assert(maxByPhase(p) < minByPhase(p + 1))
  }
}
