package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaOps
import graft.operators.{DedupQueries, MediaQueries, SamplingQueries, SimilarityQueries, TextQueries}
import graft.sources.Tables

/** Specs for the training-data-pipeline operators (text analysis,
  * dedup, similarity search, multimodal). The value-level gate is the
  * DuckDB oracle (tools/check_oracle.py); these assert structural
  * invariants, determinism, and plan shape.
  */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("every pipeline query runs and returns rows at sf0.001") {
    val names = (TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ MediaQueries.all ++ SamplingQueries.all).map(_.name)
    val counts = names.map(n => n -> run(n).count())
    val empty = counts.filter(_._2 == 0).map(_._1)
    assert(empty.isEmpty, s"unexpected empty results: $empty")
  }

  test("minhash-LSH and exact n-gram Jaccard find the same near-dup pairs") {
    val lsh = run("d02_minhash_lsh")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = run("d04_ngram_jaccard")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact, "LSH candidates (post-confirm) must equal exact pairs")
    assert(lsh.nonEmpty)
  }

  test("near-dup pairs are symmetric evidence: jaccard in (0.5, 1]") {
    val j = run("d04_ngram_jaccard").select("jacc").collect().map(_.getDouble(0))
    assert(j.forall(x => x >= 0.5 && x <= 1.0))
  }

  test("brute-force ANN: rank 1 has the highest cosine per query") {
    val rows = run("v01_ann_brute_topk")
      .select("query_id", "cos_sim", "rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRank = g.sortBy(_._3).map(_._2)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "cosine must be non-increasing in rank")
    }
  }

  test("LSH ANN results are a subset of brute-force candidates' quality") {
    // every LSH hit must be a true pair with cosine equal to the
    // exact computation (same kernel) — spot-check determinism
    val a = run("v02_ann_lsh_bucket").collect()
    val b = run("v02_ann_lsh_bucket").collect()
    assert(a.toSeq === b.toSeq, "LSH must be deterministic")
  }

  test("media features: stub decoder is deterministic and bounded") {
    val feats = MediaOps.extractFeatures(spark,
        MediaOps.mediaTable(Tables.documents(spark, sf)))
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(feats.nonEmpty)
    feats.foreach { case (_, f) =>
      assert(f.length === 4)
      assert(f(1) >= 0 && f(1) <= 255, "mean byte in [0,255]")
      assert(f(3) >= 1 && f(3) <= 256, "distinct bytes in [1,256]")
    }
    // determinism across runs
    val again = MediaOps.extractFeatures(spark,
        MediaOps.mediaTable(Tables.documents(spark, sf)))
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(feats.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("media table schema matches the declared multimodal contract") {
    val df = MediaOps.mediaTable(Tables.documents(spark, sf))
    assert(df.schema === MediaOps.mediaSchema)
  }

  test("t08 compression ratio is bounded and deterministic") {
    val a = run("t08_compression_ratio").collect()
    val b = run("t08_compression_ratio").collect()
    assert(a.toSeq === b.toSeq, "deflate must be deterministic")
    a.foreach { r =>
      val ratio = r.getDouble(3)
      assert(ratio > 0 && ratio < 1.2, s"implausible ratio $ratio")
      assert(r.getInt(2) > 0)
    }
  }

  test("quality gate filters and observes metrics in one pass") {
    val gated = graft.functions.QualityGate.filterDocuments(
      Tables.documents(spark, sf), minTokens = 100, maxRepetition = 0.5)
    val kept = gated.df.count()
    val m = gated.observation.get
    assert(m("n_total").asInstanceOf[Long] > 0)
    assert(m("n_kept").asInstanceOf[Long] === kept,
      "observed kept-count must equal the filtered row count")
    assert(m("n_kept").asInstanceOf[Long] < m("n_total").asInstanceOf[Long],
      "gate with minTokens=100 must drop some docs in this corpus")
    // buckets are mutually exclusive: they reconcile exactly
    assert(m("n_kept").asInstanceOf[Long] + m("n_null").asInstanceOf[Long]
      + m("n_too_short").asInstanceOf[Long]
      + m("n_too_repetitive").asInstanceOf[Long]
      === m("n_total").asInstanceOf[Long])
    // gated output keeps the original schema
    assert(gated.df.columns.toSeq ===
      Tables.documents(spark, sf).columns.toSeq)
  }

  test("t03 language id only emits known tags") {
    val langs = run("t03_lang_id").select("lang_pred").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es", "de", "fr")))
  }

  test("text queries keep whole-stage codegen on the scan path (t01)") {
    val df = run("t01_token_count")
    df.collect() // finalize the AQE plan so codegen spans are visible
    val plan = df.queryExecution.executedPlan.toString
    // whole-stage codegen renders as `*(n)` stage markers
    assert(plan.contains("*(1) Project"), s"plan:\n$plan")
  }

  test("hash split is partition-invariant and covers every doc once") {
    val a = run("p01_hash_split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // same computation over a differently-partitioned input must land
    // every doc in the same split — the reproducibility contract that
    // rng-based sample() cannot give
    val b = graft.operators.SamplingQueries.all.head
      .run(spark, sf) // re-run; partitioning varies with AQE anyway
    val b7 = b.repartition(7).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a === b7)
    val total = Tables.documents(spark, sf).count()
    assert(a.size.toLong === total)
    // 80/10/10 within binomial slack on this corpus
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("stratified sample rate is near 20% for every stratum") {
    val sampled = run("p02_stratified_sample").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, n) <- totals) {
      val rate = sampled.getOrElse(src, 0L).toDouble / n
      assert(rate > 0.05 && rate < 0.40, s"stratum $src rate $rate")
    }
  }

  test("d08 clusters are transitive closures of the d02 pair graph") {
    val pairs = run("d02_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cluster = run("d08_dup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every matched pair landed in the same cluster
    for ((a, b) <- pairs)
      assert(cluster(a) === cluster(b), s"pair ($a,$b) split across clusters")
    // cluster ids are canonical: the minimum member of the component
    for ((id, c) <- cluster) assert(c <= id)
    assert(cluster.values.toSet.subsetOf(cluster.keySet), "non-member cluster id")
    // reference check: union-find over the same pairs gives identical
    // components
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) parent(find(a)) = find(b)
    val expected = cluster.keys.map(id => id -> {
      val root = find(id)
      cluster.keys.filter(find(_) == root).min
    }).toMap
    assert(cluster === expected)
  }

  test("t11 redaction scrubs every planted email and phone") {
    val rows = run("t11_pii_redact").collect()
    assert(rows.nonEmpty)
    val phoneRe = """\+\d{1,2}-\d{3}-\d{4}""".r
    for (r <- rows) {
      val red = r.getString(1)
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>"), red.takeRight(80))
      assert(!red.contains("@"), red.takeRight(80))
      assert(phoneRe.findFirstIn(red).isEmpty, red.takeRight(80))
    }
  }

  test("d06 decontamination matches a brute-force 32-gram overlap") {
    import java.security.MessageDigest
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(id: Long) = java.lang.Long.parseLong(
      md5hex(id.toString).take(8), 16) % 100
    def grams(t: String) =
      (0 to t.length - 32 by 16).map(i => t.substring(i, i + 32)).toSet
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).filter(_._2.length >= 32)
    val trainGrams = docs.filter(d => bucket(d._1) < 80)
      .flatMap(d => grams(d._2)).toSet
    val expected = docs.filter(d => bucket(d._1) >= 90)
      .map { case (id, t) => id -> grams(t).count(trainGrams) }
      .filter(_._2 > 0).toMap
    val got = run("d06_decontaminate").collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got === expected)
  }

  test("chunking reassembles: stride-150 chunks cover the text exactly") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = run("t09_chunk_documents").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1)
    for ((id, cs) <- chunks) {
      val sorted = cs.sortBy(_._2).map(_._3)
      // drop the 50-char overlap from every chunk after the first
      val rebuilt = sorted.head + sorted.tail.map(c => c.drop(50)).mkString
      assert(rebuilt === docs(id), s"doc $id did not reassemble")
    }
    assert(chunks.keySet === docs.keySet)
  }
}
