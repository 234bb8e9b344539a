package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaQueries

/** Round-11 items: the m06 cap-observability precondition (the
  * pigeonhole recall guarantee is exact only while no exact band key
  * exceeds the 200-cap — observe the count instead of asserting it in
  * a comment).
  */
class Round11Spec extends AnyFunSuite {
  import TestSpark._

  test("m06: zero exact band keys exceed the 200-cap on the test " +
      "corpus, so the radius-15 recall guarantee is unconditional") {
    assert(MediaQueries.m06CappedKeyCount(spark, sf) === 0L)
    PersistRegistry.release()
  }

  test("m06: the cap precondition also holds at the oracle gate's " +
      "sf0.01") {
    assert(MediaQueries.m06CappedKeyCount(spark, "/root/testdata/sf0.01")
      === 0L)
    PersistRegistry.release()
  }

  // --- v20 adaptive search depth (round-10 residual #1) ---
  // The builder's own round-10 measurement was the failing test:
  // fixed H=6/B=8 gave 65% recall@3 vs the exhaustive v03 walk on
  // sf0.1's ~4000-vector cells. The knobs now size themselves from
  // the largest probed cell; this runs the REAL sf0.1 fixture.

  private def pairsAt(d: String, name: String): Set[(Long, Long)] = {
    val p = SparkEntry.queries(name)(spark, d)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    PersistRegistry.release()
    p
  }

  test("v20: adaptive H/B clears 90% recall@3 vs exhaustive v03 on " +
      "sf0.1's largest cells (fixed H=6/B=8 measured 65% in round 10)") {
    val big = "/root/testdata/sf0.1"
    val beam = pairsAt(big, "v20_graph_beam_search")
    val (h, b) = graft.operators.SimilarityQueries.v20Knobs.get()
    val exact = pairsAt(big, "v03_ann_ivf_cell")
    val overlap = (beam & exact).size
    // current sf0.1 fixture: 10 cells, max ~218 vectors ->
    // H = ceil(log3 218) + 2 = 7 (vs the sf0.001 floor 6); a
    // regenerated fixture with bigger cells sizes deeper still.
    assert(h >= 7 && b === 2 * h,
      s"knobs (H=$h, B=$b) did not grow with sf0.1's cell sizes")
    assert(overlap * 10 >= exact.size * 9,
      s"recall@3 $overlap/${exact.size} below the 90% floor at H=$h B=$b")
    info(s"recall@3 = $overlap/${exact.size} at H=$h B=$b")
  }

  test("v20: the sizing rule is log3|cell| + 2 with the round-10 " +
      "floor, and B tracks 2H") {
    import graft.operators.SimilarityQueries.v20SizeKnobs
    assert(v20SizeKnobs(2) === ((6, 12)))     // floor: never shallower
    assert(v20SizeKnobs(218) === ((7, 14)))   // sf0.1-scale cells
    assert(v20SizeKnobs(4000) === ((10, 20)))
    assert(v20SizeKnobs(400000) === ((14, 28)))
  }

  // --- v21 graph insert (round-11 extension): HNSW-style index
  // maintenance — the batch (vec_id % 89 == 0) is excluded from the
  // base graph and each insert beam-walks the base cell for its k=3
  // edges.

  test("v21: every insert gets exactly 3 ranked edges, all into " +
      "BASE nodes of one cell, with true quantized cosines") {
    val rows = SparkEntry.queries("v21_graph_insert")(spark, sf).collect()
    PersistRegistry.release()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1),
        r.getSeq[Float](2).map(x => math.round(x.toDouble * 10000)).toArray)))
      .toMap
    def nn(v: Array[Long]) = v.map(x => x * x).sum
    val inserts = emb.keys.filter(_ % 89 == 0).toSet
    assert(rows.map(_.getLong(0)).toSet === inserts,
      "every insert searches, nothing else does")
    for ((q, rs) <- rows.groupBy(_.getLong(0))) {
      assert(rs.map(_.getInt(3)).sorted.toSeq === Seq(1, 2, 3))
      for (r <- rs) {
        val nb = r.getLong(1)
        assert(nb % 89 != 0, s"insert $q linked to another insert $nb")
        val (rq, rc) = (emb(q)._2, emb(nb)._2)
        val expect = rq.lazyZip(rc).map(_ * _).sum.toDouble /
          math.sqrt(nn(rq).toDouble * nn(rc).toDouble)
        assert(r.getDouble(2) === expect,
          s"cos($q, $nb) drifted from the quantized truth")
      }
      assert(rs.map(r => emb(r.getLong(1))._1).toSet.size === 1,
        s"insert $q's edges span more than one cell")
    }
  }

  test("v21: insert edges match the exhaustive in-cell top-3 at 90%+ " +
      "on sf0.1 (the walk finds the same neighbors a full rebuild would)") {
    val big = "/root/testdata/sf0.1"
    val got = SparkEntry.queries("v21_graph_insert")(spark, big).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    PersistRegistry.release()
    val emb = spark.read.parquet(s"$big/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.round(x.toDouble * 10000)).toArray))
    def nn(v: Array[Long]) = v.map(x => x * x).sum
    val base = emb.filter(_._1 % 89 != 0)
    // exhaustive truth: each insert's top-3 base nodes in its BEST
    // base cell (centroid = exact integer component-wise sum; the
    // same probe rule the engine runs)
    val cents = base.groupBy(_._2).map { case (lb, vs) =>
      lb -> (0 until 64).map(j => vs.map(_._3(j)).sum).toArray
    }
    val exact = emb.filter(_._1 % 89 == 0).flatMap { case (q, _, rq) =>
      def cos(rc: Array[Long]) = rq.lazyZip(rc).map(_ * _).sum.toDouble /
        math.sqrt(nn(rq).toDouble * nn(rc).toDouble)
      val lb = cents.toSeq.map { case (l, c) => (-cos(c), l) }.min._2
      base.filter(_._2 == lb).map { case (id, _, rc) => (-cos(rc), id) }
        .sorted.take(3).map { case (_, id) => (q, id) }
    }.toSet
    val overlap = (got & exact).size
    assert(overlap * 10 >= exact.size * 9,
      s"insert-edge recall $overlap/${exact.size} below 90%")
    info(s"insert-edge recall = $overlap/${exact.size}")
  }
}
