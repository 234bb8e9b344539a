package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Semantics specs for the round-6 extension batch: t14 LM-perplexity
  * quality, p08 token-balanced serpentine sharding, d13 dedup-method
  * agreement audit, v12 filtered ANN. Each test asserts the
  * operator's defining identity; value parity is the oracle gate's
  * job.
  */
class Round6ExtensionSpec extends AnyFunSuite {
  import TestSpark._

  test("t14 LM quality: per-doc cross-entropy bounded, token counts exact") {
    val rows = SparkEntry.queries("t14_lm_quality")(spark, sf).collect()
    PersistRegistry.release()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length.toLong === nDocs)
    val totalTokens = rows.map(_.getLong(1)).sum
    val maxXent = math.log(totalTokens.toDouble) / math.log(2.0)
    for (r <- rows) {
      val xent = r.getDouble(2)
      // -avg log2(c/N): every c >= 1 bounds each term by log2 N; a
      // doc of singleton tokens attains it, a doc of the corpus's
      // commonest tokens sits near the bottom — but never <= 0
      assert(xent > 0.0 && xent <= maxXent + 0.01,
        s"doc ${r.getLong(0)} xent $xent outside (0, log2 N]")
    }
    // n_tokens agrees with t01's tokenizer
    val t01 = SparkEntry.queries("t01_token_count")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    PersistRegistry.release()
    for (r <- rows)
      assert(r.getLong(1) === t01(r.getLong(0)))
  }

  test("p08 serpentine shards: matches naive global rank, balanced") {
    val rows = SparkEntry.queries("p08_balanced_shards")(spark, sf).collect()
    PersistRegistry.release()
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // naive reference: one global sort, serpentine deal — the
    // partition-offset rank in the operator must reproduce it exactly
    val naive = got.map { case (id, tok, _) => (id, tok) }
      .sortBy { case (id, tok) => (-tok, id) }
      .zipWithIndex.map { case ((id, tok), rn0) =>
        val pos = rn0 % 8
        val shard = if ((rn0 / 8) % 2 == 0) pos else 7 - pos
        (id, tok, shard)
      }.sortBy(_._1)
    assert(got.sortBy(_._1).toSeq === naive.toSeq)
    // the serpentine guarantee: with docs dealt in descending size
    // order, shard token totals differ by at most one max-size doc
    val totals = got.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    assert(totals.keySet === (0 until 8).toSet)
    val spread = totals.values.max - totals.values.min
    val maxDoc = got.map(_._2).max
    assert(spread <= maxDoc,
      s"shard spread $spread exceeds max doc size $maxDoc")
  }

  test("d13 audit: per-method totals equal each detector's pair count") {
    val audit = SparkEntry.queries("d13_dedup_audit")(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) ->
        r.getLong(3)).toMap
    PersistRegistry.release()
    def methodTotal(i: Int): Long =
      audit.collect { case (k, n) if Seq(k._1, k._2, k._3)(i) => n }.sum
    val d02 = SparkEntry.queries("d02_minhash_lsh")(spark, sf).count()
    PersistRegistry.release()
    val d04 = SparkEntry.queries("d04_ngram_jaccard")(spark, sf).count()
    PersistRegistry.release()
    val d07 = SparkEntry.queries("d07_simhash_neardup")(spark, sf).count()
    PersistRegistry.release()
    assert(methodTotal(0) === d02, "in_minhash total != d02 pairs")
    assert(methodTotal(1) === d04, "in_ngram total != d04 pairs")
    assert(methodTotal(2) === d07, "in_simhash total != d07 pairs")
    // no phantom combination: every audited pair is in >= 1 method
    assert(!audit.contains((false, false, false)))
  }

  test("v12 filtered ANN: predicate respected, usable recall vs exact") {
    val v12 = SparkEntry.queries("v12_filtered_ann")(spark, sf).collect()
    PersistRegistry.release()
    val byQuery = v12.groupBy(_.getLong(0))
    for ((q, rows) <- byQuery) {
      assert(rows.length <= 3)
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to rows.length))
      for (r <- sorted) {
        assert(r.getLong(1) % 3 === 0,
          s"neighbor ${r.getLong(1)} violates the metadata predicate")
        assert(r.getLong(1) !== q)
      }
    }
    // exact FILTERED brute-force truth (quantized-integer cosine, the
    // engine's own scheme) — the probe-2 search must recover at least
    // half of the true filtered top-3 overall
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 10000).cast("long")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def cos(a: Long, b: Long): Double = {
      val (ra, rb) = (vecs(a), vecs(b))
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < ra.length) {
        dot += ra(i) * rb(i); na += ra(i) * ra(i); nb += rb(i) * rb(i)
        i += 1
      }
      dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
    }
    val queries = vecs.keys.filter(_ < 20).toSeq
    var hits = 0; var postHits = 0; var total = 0
    for (q <- queries) {
      val truth = vecs.keys
        .filter(c => c % 3 == 0 && c != q).toSeq
        .map(c => (c, cos(q, c)))
        .sortBy { case (c, s) => (-s, c) }.take(3).map(_._1).toSet
      val found = byQuery.getOrElse(q, Array.empty)
        .map(_.getLong(1)).toSet
      hits += truth.intersect(found).size
      total += truth.size
      // the strategy comparison: POST-filtering even the EXACT
      // unfiltered top-3 must not beat the pre-filtered probe search
      val postFiltered = vecs.keys
        .filter(_ != q).toSeq
        .map(c => (c, cos(q, c)))
        .sortBy { case (c, s) => (-s, c) }.take(3).map(_._1)
        .filter(_ % 3 == 0).toSet
      postHits += truth.intersect(postFiltered).size
    }
    assert(hits * 2 >= total,
      s"filtered recall@3 $hits/$total below 0.5 — index unusable")
    assert(hits > postHits,
      s"pre-filter ($hits) must dominate exact-then-post-filter ($postHits)")
  }

  test("t15 BPE pairs: vocab-level counting is lossless vs raw corpus") {
    val got = SparkEntry.queries("t15_bpe_pair_counts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    PersistRegistry.release()
    // naive reference: count char bigrams over EVERY token occurrence
    // (the formulation the vocab-weighted fan-out must reproduce)
    val counts = scala.collection.mutable.HashMap
      .empty[String, Long].withDefaultValue(0L)
    for (r <- Tables.documents(spark, sf).select("text").collect();
         w <- r.getString(0).trim.split("\\s+") if w.length >= 2;
         i <- 0 until (w.length - 1))
      counts(w.substring(i, i + 2)) += 1L
    val naive = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq === naive)
  }

  test("p09 DSIR weights: target-tier docs score above the rest") {
    val lr = SparkEntry.queries("p09_dsir_weights")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    PersistRegistry.release()
    val tiers = Tables.documents(spark, sf).select("doc_id", "source")
      .collect()
      .map(r => r.getLong(0) ->
        Set("src0", "src1", "src2", "src3").contains(r.getString(1)))
      .toMap
    def mean(xs: Iterable[Double]): Double = xs.sum / xs.size
    val hi = mean(lr.collect { case (id, v) if tiers(id) => v })
    val rest = mean(lr.collect { case (id, v) if !tiers(id) => v })
    // the whole point of importance weighting: docs drawn from the
    // target distribution average a higher log-likelihood ratio
    assert(hi > rest, s"hi-tier mean $hi not above rest mean $rest")
  }

  test("d14 wide SimHash: banding recall is TOTAL at Hamming<=3") {
    val got = SparkEntry.queries("d14_simhash_scale")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    PersistRegistry.release()
    // brute-force truth over all fingerprint pairs — the pigeonhole
    // claim (<=3 flipped bits leave one 15-bit band intact) means the
    // band join may MISS NOTHING at the threshold
    val fps = graft.functions.TextKernels
      .simhash60(spark, Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val truth = (for {
      i <- fps.indices.iterator
      j <- (i + 1) until fps.length
      h = java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2)
      if h <= 3
    } yield (fps(i)._1, fps(j)._1, h)).toSet
    assert(got === truth)
    // and the wide fingerprint separates: random pairs concentrate
    // near 30 of 60 bits, so the threshold cut is a tiny fraction of
    // the pair space (precision — d07's 8-bit collision noise gone)
    assert(truth.size < fps.length,
      "hamming<=3 pairs should be rarer than docs at 60 bits")
  }

  test("t16 repetition signals: map-only kernel matches naive recount") {
    val got = SparkEntry.queries("t16_repetition_signals")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    PersistRegistry.release()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
    assert(got.size === docs.length)
    for (r <- docs) {
      val w = r.getString(1).trim.split("\\s+")
      def sig(n: Int): (Long, Long) = {
        val grams = w.sliding(n).filter(_.length == n).map(_.mkString(" "))
          .toSeq.groupBy(identity).map(_._2.size.toLong)
        if (grams.isEmpty) (0L, 0L)
        else (grams.max, grams.filter(_ > 1).sum)
      }
      val (t2, d2) = sig(2)
      val (t3, d3) = sig(3)
      assert(got(r.getLong(0)) === ((w.length.toLong, t2, d2, t3, d3)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("p10 domain cap: pruned rank equals unpruned truth, cap holds") {
    val got = SparkEntry.queries("p10_domain_cap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    PersistRegistry.release()
    // the prune must be LOSSLESS: result equals the plain top-10 by
    // (hv, doc_id) per source computed without any threshold
    def hv(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val docs = Tables.documents(spark, sf).select("source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val truth = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.map { case (_, id) => (hv(id), id) }.sorted.take(10).zipWithIndex
        .map { case ((_, id), i) => (src, id, (i + 1).toLong) }
    }.sortBy(t => (t._1, t._3))
    assert(got.toSeq === truth)
    // cap semantics: never more than 10 per source, exactly 10 when
    // the source has >= 10 docs
    val perSrc = got.groupBy(_._1).map { case (s2, g) => s2 -> g.length }
    val sizes = docs.groupBy(_._1).map { case (s2, g) => s2 -> g.length }
    for ((src, n) <- perSrc)
      assert(n === math.min(10, sizes(src)), s"source $src")
  }

  test("v13 kNN graph: per-vector in-cell top-3 equals naive truth") {
    val got = SparkEntry.queries("v13_knn_graph")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(3)), r.getLong(1))).toMap
    PersistRegistry.release()
    val n = graft.operators.DedupQueries.quantized(spark, sf)
      .select("vec_id", "label", "r", "nn").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray,
        r.getLong(3)))
    val truth = n.groupBy(_._2).values.toSeq.flatMap { cell =>
      cell.toSeq.flatMap { case (id, _, ra, nna) =>
        cell.toSeq.filter(_._1 != id).map { case (cid, _, rc, nnc) =>
          val dot = ra.zip(rc).map { case (x, y) => x * y }.sum
          (cid, dot.toDouble / math.sqrt(nna.toDouble * nnc.toDouble))
        }.sortBy { case (cid, cs) => (-cs, cid) }.take(3).zipWithIndex
          .map { case ((cid, _), k) => ((id, k + 1), cid) }
      }
    }.toMap
    assert(got === truth)
  }

  test("d15 semantic dedup: clusters + canonical match naive union-find") {
    val got = SparkEntry.queries("d15_semantic_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    PersistRegistry.release()
    val pairs = SparkEntry.queries("d09_ivf_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    PersistRegistry.release()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nn = graft.operators.DedupQueries.quantized(spark, sf)
      .select("vec_id", "nn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).toSeq.map { case (root, ms) =>
        // canonical: largest norm, vec_id tiebreak
        val kept = ms.map(m => (-nn(m), m)).min._2
        (root, kept, ms.length.toLong, ms.length.toLong - 1)
      }.sortBy(_._1)
    assert(got.toSeq === truth)
  }

  test("v14 recall curve: monotone recall, growing cost, agrees with v06") {
    val rows = SparkEntry.queries("v14_recall_curve")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    PersistRegistry.release()
    assert(rows.map(_._1).toSeq === Seq(1, 2, 3, 4))
    // widening the probe can only add candidates, so recall is
    // monotone and the paid candidate count strictly grows
    val rec = rows.map(_._5)
    assert(rec.zip(rec.tail).forall { case (a, b) => b >= a }, rec.toSeq)
    val cands = rows.map(_._2)
    assert(cands.zip(cands.tail).forall { case (a, b) => b > a },
      cands.toSeq)
    // the nprobe=2 curve point IS v06's measured v05 row — the two
    // artifacts must tell one story
    val v06 = SparkEntry.queries("v06_ann_recall")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    PersistRegistry.release()
    assert((rows(1)._3, rows(1)._4) === v06("v05_ivf_probe2"))
  }
}
