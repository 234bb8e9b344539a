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
