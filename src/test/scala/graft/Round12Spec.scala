package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 items: the post-insert graph lifecycle (v22). v21 derives
  * each insert's edges; v22 publishes the augmented graph and serves
  * searches from it. These tests prove the maintenance path is
  * EQUIVALENT to the rebuild it exists to avoid: searching the
  * committed base+insert graph agrees with searching a full Σcell²
  * rebuild, and the inserted vectors are live members of the index.
  */
class Round12Spec extends AnyFunSuite {
  import TestSpark._

  private def pairsAt(d: String, name: String): Map[Long, Seq[Long]] = {
    val rows = SparkEntry.queries(name)(spark, d)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    PersistRegistry.release()
    rows.groupBy(_._1).map { case (q, rs) =>
      q -> rs.sortBy(_._3).map(_._2).toSeq
    }
  }

  test("v22: search over the committed post-insert graph agrees with " +
      "search over a full rebuild (v20) at 95%+ top-3 overlap on sf0.1") {
    val big = "/root/testdata/sf0.1"
    val after = pairsAt(big, "v22_insert_commit_search")
    val rebuild = pairsAt(big, "v20_graph_beam_search")
    assert(after.keySet === rebuild.keySet, "same query set")
    val total = rebuild.valuesIterator.map(_.size).sum
    val overlap = rebuild.keysIterator.map { q =>
      (after(q).toSet & rebuild(q).toSet).size
    }.sum
    assert(overlap * 100 >= total * 95,
      s"post-insert search agreement $overlap/$total below 95% vs rebuild")
    info(s"search-after-insert vs search-after-rebuild: $overlap/$total")
  }

  test("v22: the committed graph carries every insert's 3 edges on " +
      "top of the base graph, and an inserted vector (vec 0) serves " +
      "as a live search query") {
    val plus = graft.operators.SimilarityQueries
      .insertAugmentedGraph(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    PersistRegistry.release()
    val inserts = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0))
      .filter(_ % 89 == 0).toSet
    val byInsert = plus.filter(p => inserts(p._1)).groupBy(_._1)
    assert(byInsert.keySet === inserts,
      "every insert appears as a source in the committed graph")
    assert(byInsert.values.forall(_.length === 3),
      "each insert carries exactly its 3 walk-found edges")
    assert(plus.forall(p => !inserts(p._2)),
      "no stored edge targets an insert (reverse reachability comes " +
        "from search-time symmetrization, as for the batch-built graph)")
    // vec 0 is in the batch (0 % 89 == 0) AND in the standard query
    // set (vec_id < 20): the post-insert search must serve it like
    // any committed member
    val after = pairsAt(sf, "v22_insert_commit_search")
    assert(after.contains(0L) && after(0L).size === 3,
      "the inserted vector 0 searches the post-insert graph")
  }

  test("v23: no deleted id appears in any search result, and the " +
      "committed repaired graph touches no deleted node") {
    val deleted = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0))
      .filter(_ % 97 == 0).toSet
    val res = pairsAt(sf, "v23_graph_delete_search")
    assert(res.keySet.forall(q => !deleted(q)),
      "no deleted vector serves as a query")
    assert(!res.keySet.contains(0L) && res.keySet.size === 19,
      "vec 0 is deleted (0 % 97 == 0), the other 19 standard queries run")
    assert(res.valuesIterator.flatten.forall(n => !deleted(n)),
      "no deleted vector is returned as a neighbor")
    val edges = graft.operators.SimilarityQueries
      .deleteRepairedGraph(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    PersistRegistry.release()
    assert(edges.forall { case (a, b) => !deleted(a) && !deleted(b) },
      "the committed repaired graph has no edge incident to a delete")
  }

  test("v23: search over the prune+repair graph agrees with search " +
      "over a full rebuild without the batch at 95%+ on sf0.1") {
    val big = "/root/testdata/sf0.1"
    val after = pairsAt(big, "v23_graph_delete_search")
    val reb = {
      val rows = graft.operators.SimilarityQueries
        .deleteRebuildSearch(spark, big)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      PersistRegistry.release()
      rows.groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(_._2).toSeq
      }
    }
    assert(after.keySet === reb.keySet, "same survivor query set")
    val total = reb.valuesIterator.map(_.size).sum
    val overlap = reb.keysIterator.map { q =>
      (after(q).toSet & reb(q).toSet).size
    }.sum
    assert(overlap * 100 >= total * 95,
      s"delete-repair search agreement $overlap/$total below 95% vs rebuild")
    info(s"search-after-delete vs rebuild-without-batch: $overlap/$total")
  }

  test("v26: filtered graph search recalls 90%+ of the exhaustive " +
      "in-cell FILTERED top-3 on sf0.1, and returns only passing nodes") {
    val big = "/root/testdata/sf0.1"
    val got = SparkEntry.queries("v26_filtered_graph_search")(spark, big)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    PersistRegistry.release()
    assert(got.forall(_._2 % 3 == 0), "every neighbor passes the filter")
    // exhaustive filtered truth: the query's best cell (the same
    // integer-centroid probe rule), top-3 among its % 3 == 0 members
    val emb = spark.read.parquet(s"$big/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.round(x.toDouble * 10000)).toArray))
    def nn(v: Array[Long]) = v.map(x => x * x).sum
    val cents = emb.groupBy(_._2).map { case (lb, vs) =>
      lb -> (0 until 64).map(j => vs.map(_._3(j)).sum).toArray
    }
    val exact = emb.filter(_._1 < 20).flatMap { case (q, _, rq) =>
      def cos(rc: Array[Long]) = rq.lazyZip(rc).map(_ * _).sum.toDouble /
        math.sqrt(nn(rq).toDouble * nn(rc).toDouble)
      val lb = cents.toSeq.map { case (l, c) => (-cos(c), l) }.min._2
      emb.filter(v => v._2 == lb && v._1 % 3 == 0 && v._1 != q)
        .map { case (id, _, rc) => (-cos(rc), id) }
        .sorted.take(3).map { case (_, id) => (q, id) }
    }.toSet
    val overlap = (got.toSet & exact).size
    assert(overlap * 10 >= exact.size * 9,
      s"filtered recall@3 $overlap/${exact.size} below 90%")
    info(s"filtered graph recall@3 = $overlap/${exact.size}")
  }
}
