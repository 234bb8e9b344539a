package graft

import scala.math.BigDecimal.RoundingMode

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 operator: v20 graph-ANN beam search (IVF coarse entry +
  * beam walk over v13's committed k-NN graph, symmetrized and
  * multi-seeded). Semantic properties beyond the value oracle: the
  * walk never leaves the probed cell, every reported cosine is the
  * true integer-quantized cosine recomputed from the raw embeddings,
  * and the beam's recall against the exhaustive in-cell search (v03)
  * clears the measured floor (56/60 at sf0.001; asserted at 3/4).
  */
class Round10OperatorsSpec extends AnyFunSuite {
  import TestSpark._

  private def pairs(name: String): Set[(Long, Long)] = {
    val p = SparkEntry.queries(name)(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    PersistRegistry.release()
    p
  }

  test("v20: three ranked neighbors per query, never the query itself") {
    val rows = SparkEntry.queries("v20_graph_beam_search")(spark, sf).collect()
    PersistRegistry.release()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === 20)
    for ((q, rs) <- byQ) {
      assert(rs.map(_.getInt(3)).sorted.toSeq === Seq(1, 2, 3),
        s"query $q ranks not 1..3")
      assert(!rs.exists(_.getLong(1) == q), s"query $q returned itself")
    }
  }

  test("v20: the walk stays in one IVF cell per query and reported " +
      "cosines are the true quantized cosines") {
    val rows = SparkEntry.queries("v20_graph_beam_search")(spark, sf).collect()
    PersistRegistry.release()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Number]("label").longValue(),
          r.getSeq[Float](2).toArray))
      .toMap
    // the engine's quantization rule verbatim: round(x * 10^4) HALF_UP
    def rOf(id: Long): Array[Long] = emb(id)._2.map(x =>
      BigDecimal(x.toDouble * 10000).setScale(0, RoundingMode.HALF_UP).toLong)
    def nn(r: Array[Long]): Long = r.map(x => x * x).sum
    for (row <- rows) {
      val (q, nb, cos) = (row.getLong(0), row.getLong(1), row.getDouble(2))
      val (rq, rc) = (rOf(q), rOf(nb))
      val dot = rq.lazyZip(rc).map(_ * _).sum
      val expect = dot.toDouble / math.sqrt(nn(rq).toDouble * nn(rc).toDouble)
      assert(cos === expect, s"cos($q, $nb) drifted from the quantized truth")
    }
    for ((q, rs) <- rows.groupBy(_.getLong(0)))
      assert(rs.map(r => emb(r.getLong(1))._1).toSet.size === 1,
        s"query $q's neighbors span more than one IVF cell")
  }

  test("v20: beam recall@3 vs the exhaustive in-cell search (v03) " +
      "clears the floor") {
    val beam = pairs("v20_graph_beam_search")
    val exact = pairs("v03_ann_ivf_cell")
    val overlap = (beam & exact).size
    assert(overlap * 4 >= exact.size * 3,
      s"recall@3 $overlap/${exact.size} below the 3/4 floor " +
      "(measured 56/60 on this fixture)")
  }

  test("p16: every epoch is a full permutation of the corpus, and " +
      "epochs genuinely reshuffle") {
    val rows = SparkEntry.queries("p16_epoch_shuffle")(spark, sf).collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("shard"), r.getAs[Long]("pos_in_shard")))
    PersistRegistry.release()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet === Set(0, 1, 2))
    for ((e, rs) <- byEpoch) {
      assert(rs.map(_._2).distinct.length.toLong === nDocs,
        s"epoch $e is not a permutation of the corpus")
      // (shard, pos) is a dense order: positions within each shard
      // are exactly 1..|shard|
      for ((_, srs) <- rs.groupBy(_._3))
        assert(srs.map(_._4).sorted.toSeq === (1L to srs.length).toSeq,
          s"epoch $e has gaps in a shard's positions")
    }
    // reshuffle: the doc -> (shard, pos) schedule must differ between
    // every epoch pair for a substantial fraction of docs
    val sched = byEpoch.map { case (e, rs) =>
      e -> rs.map(r => r._2 -> ((r._3, r._4))).toMap
    }
    for (a <- 0 to 1; b <- a + 1 to 2) {
      val moved = sched(a).count { case (doc, sp) => sched(b)(doc) != sp }
      assert(moved.toLong * 2 > nDocs,
        s"epochs $a and $b share the schedule for most docs — not a " +
        "reshuffle")
    }
  }

  test("d17: the contamination-rate report reconciles exactly with " +
      "d06's contaminated-doc set") {
    val rate = SparkEntry.queries("d17_contamination_rate")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    PersistRegistry.release()
    val d06 = SparkEntry.queries("d06_decontaminate")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    PersistRegistry.release()
    // every d06 hit appears with the identical shared count; every
    // clean doc reports zero; rates are consistent and bounded
    assert(rate.collect { case (d, (_, sh, _)) if sh > 0 => d -> sh } ===
      d06, "d17's nonzero rows diverge from d06's contaminated set")
    for ((doc, (n, sh, bp)) <- rate) {
      assert(n > 0 && sh >= 0 && sh <= n, s"doc $doc counts inconsistent")
      assert(bp === sh * 10000 / n, s"doc $doc rate arithmetic wrong")
      assert(bp >= 0 && bp <= 10000)
    }
    assert(rate.values.exists(_._2 == 0),
      "no clean test doc in the report — the LEFT join degenerated")
  }
}
