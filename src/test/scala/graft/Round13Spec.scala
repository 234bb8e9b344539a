package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions: the boatrace data-quality audits (a05/a06 —
  * the reference's ACTUAL data-quality story: composite PK and the
  * rows main.py:262's inner join silently drops) and the committed
  * t08 expected-bytes fixture (the DuckDB-computable form of the
  * deflate oracle, so the driver's gate gets real booleans).
  */
class Round13Spec extends AnyFunSuite {
  import TestSpark._

  test("a05: every parsed boatrace base table's declared PK is " +
      "unique on the golden corpus") {
    val rows = SparkEntry.queries("a05_boatrace_pk")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    PersistRegistry.release()
    assert(rows.map(_._1).toSeq ===
      Seq("env", "odds", "result", "schedule"))
    rows.foreach { case (t, nRows, nKeys, nDup, maxMult) =>
      assert(nRows === nKeys, s"$t PK not unique: $nDup dup rows")
      assert(maxMult === 1L, s"$t worst key multiplicity $maxMult")
      assert(nRows > 0, s"$t is empty")
    }
  }

  test("a06 quantifies exactly what the reference's inner join drops: " +
      "result rows minus schedule-orphans = race table rows") {
    val edges = SparkEntry.queries("a06_boatrace_orphans")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val raceRows = SparkEntry.queries("boatrace_race_table")(spark, sf)
      .count()
    PersistRegistry.release()
    // every env race has finishers, every finisher has an env header,
    // every odds row has a race — the corpus's clean edges
    assert(edges("env->result")._2 === 0L)
    assert(edges("result->env")._2 === 0L)
    assert(edges("odds->env")._2 === 0L)
    // the two documented drop edges (SURVEY §5): finishers missing
    // from the schedule and scheduled entries that never finished —
    // the audit's counts must reconcile exactly with the join output
    val (nResult, schedOrphans) = edges("result->schedule")
    assert(schedOrphans > 0, "expected the corpus's known drop rows")
    assert(nResult - schedOrphans === raceRows,
      "result rows minus schedule-orphans must equal the inner-join " +
      "race table rows — the audit and the join must tell one story")
  }

  test("the committed t08 fixture matches the live corpus's deflate " +
      "byte counts (engine Deflater == committed CPython zlib)") {
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val base = new java.io.File(sfDir).getName
      val res = getClass.getResourceAsStream(s"/graft/t08/$base.csv")
      assert(res != null, s"missing committed fixture for $base")
      val fixture = scala.io.Source.fromInputStream(res, "UTF-8")
        .getLines().drop(1)
        .map { l => val Array(a, b) = l.split(",", 2); (a.toLong, b.toInt) }
        .toMap
      val live = SparkEntry.queries("t08_compression_ratio")(spark, sfDir)
        .select("doc_id", "n_compressed")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      PersistRegistry.release()
      assert(live.length === fixture.size, s"$base row count drifted — " +
        "regenerate with tools/gen_t08_fixture.py")
      live.foreach { case (id, z) =>
        assert(fixture(id) === z, s"$base doc $id: fixture ${fixture(id)} " +
          s"!= live $z — documents fixture changed; regenerate with " +
          "tools/gen_t08_fixture.py")
      }
    }
  }

  test("Verify dumps t08_expected from the committed fixture and the " +
      "oracle join is total (every doc joins)") {
    val out = Files.createTempDirectory("graft-t08-dump-").toString
    graft.operators.TextQueries.dumpT08Expected(spark, sf, out)
    val dumped = spark.read.parquet(s"$out/t08_expected")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id")
    assert(dumped.count() === docs.count())
    assert(dumped.join(docs, "doc_id").count() === docs.count(),
      "every document must join an expected-bytes row")
    assert(dumped.schema.map(f => (f.name, f.dataType.typeName)).toSet ===
      Set(("doc_id", "long"), ("n_compressed", "integer")))
  }

  test("d18: segment blocking finds every exact-title duplicate pair " +
      "(the ed=0 floor), and every reported pair is within threshold") {
    val titles = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 4))
          .as("title"))
      .filter(length(col("title")) >= 9)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // ground truth: all same-title pairs (edit distance 0 — the
    // pigeonhole guarantee's easiest certificate: all 3 segments match)
    val exactPairs = titles.groupBy(_._2).values.filter(_.length > 1)
      .flatMap(g => g.map(_._1).sorted.combinations(2)
        .map(p => (p(0), p(1))))
      .toSet
    val out = SparkEntry.queries("d18_editdistance_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    PersistRegistry.release()
    assert(out.nonEmpty, "expected near-dup pairs in the corpus")
    assert(out.forall { case (a, b, ed) => a < b && ed >= 0 && ed <= 3 },
      "a reported pair violates ordering or the threshold")
    val reported = out.map { case (a, b, _) => (a, b) }.toSet
    assert(exactPairs.subsetOf(reported),
      s"missed ${(exactPairs -- reported).size} exact-duplicate pairs " +
      "— the segment blocking must never lose an ed=0 pair")
    assert(out.filter(_._3 == 0).map(p => (p._1, p._2)).toSet === exactPairs,
      "ed=0 output must be exactly the same-title pairs")
  }

  test("v27: the both-verbs maintained graph (insert + delete on ONE " +
      "index) serves search in agreement with a full survivor rebuild, " +
      "with zero deleted endpoints and every live insert wired in") {
    import graft.operators.SimilarityQueries
    val big = "/root/testdata/sf0.1"
    val v27 = SparkEntry.queries("v27_lifecycle_search")(spark, big)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val reb = SimilarityQueries.deleteRebuildSearch(spark, big)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val agree = v27.toSet.intersect(reb.toSet).size
    info(s"lifecycle vs survivor-rebuild agreement: $agree/${reb.length}")
    assert(agree >= (reb.length * 0.9).toInt,
      s"maintained-index search agreement $agree/${reb.length} below 90%")

    val edges = SimilarityQueries.lifecycleMaintainedGraph(spark, big)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    PersistRegistry.release()
    def deleted(id: Long) = id % 97 == 0 && id < 1000000000L
    assert(!edges.exists { case (u, w) => deleted(u) || deleted(w) },
      "a deleted id survived as a maintained-graph endpoint")
    // every live insert (in the 89-batch, not in the 97-batch) must
    // have its walk edges present — the insert verb survived the
    // delete verb's republish
    val liveInserts = spark.read.parquet(s"$big/embeddings.parquet")
      .filter(col("vec_id") % 89 === 0 && !(col("vec_id") % 97 === 0))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sources = edges.map(_._1).toSet
    val unwired = liveInserts -- sources
    assert(unwired.isEmpty,
      s"live inserts lost their edges in the composed maintenance: " +
      unwired.take(5).mkString(", "))
  }

  test("v24's health rule over the MAINTAINED graphs (insert-augmented " +
      "and delete-repaired) stays within the committed graph's envelope") {
    import graft.operators.SimilarityQueries
    def agg(df: org.apache.spark.sql.DataFrame)
        : (Double, Double, Long) = {
      val r = df.agg(sum("n_edges"), sum("n_reciprocal"),
        sum("n_nodes"), sum("n_unreferenced"), max("max_in_degree"))
        .collect().head
      val (e, rc, n, u, m) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      (rc.toDouble / e, u.toDouble / n, m)
    }
    val committed = agg(SparkEntry.queries("v24_graph_health")(spark, sf))
    // insert-augmented: the graph the streaming-insert path maintains
    val ins = agg(SimilarityQueries.graphHealth(spark, sf,
      SimilarityQueries.insertAugmentedGraph(spark, sf)))
    // delete-repaired: the graph the streaming-delete path maintains
    // (nodes restricted to survivors — deleted ids are gone, not sinks)
    val del = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("del_id"))
    val deld = agg(SimilarityQueries.graphHealth(spark, sf,
      SimilarityQueries.streamDeleteEdges(spark, sf, del),
      nodeFilter = !(col("vec_id") % 97 === 0)))
    PersistRegistry.release()
    for ((name, (recip, sink, maxDeg)) <- Seq("insert" -> ins,
        "delete" -> deld)) {
      assert(recip >= committed._1 - 0.15,
        s"$name-maintained reciprocity $recip collapsed vs " +
        s"committed ${committed._1}")
      assert(sink <= committed._2 + 0.05,
        s"$name-maintained sink fraction $sink grew vs " +
        s"committed ${committed._2}")
      assert(maxDeg <= committed._3 * 2 + 4,
        s"$name-maintained hub degree $maxDeg blew past " +
        s"committed ${committed._3}")
    }
  }
}
