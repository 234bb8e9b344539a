package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Semantics specs for the round-3 operator batch (q54-q59, s05, t12)
  * — each asserts the operator's defining identity, not just row
  * counts (the oracle gate covers value parity; these cover the
  * properties that make the operator correct by construction).
  */
class NewOperatorsSpec extends AnyFunSuite {
  import TestSpark._

  test("q54 unpivot: 3 rows per wide row, reassembles to the wide form") {
    val long = SparkEntry.queries("q54_unpivot")(spark, sf)
    val base = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 97 === 0)
    assert(long.count() === base.count() * 3)
    // each measure's long slice is the exact multiset of the wide
    // column ((l_orderkey, l_linenumber) is NOT unique in the
    // synthetic data, so the check must be multiset equality, not a
    // pivot-back join)
    for ((m, c) <- Seq("quantity" -> "l_quantity",
        "extendedprice" -> "l_extendedprice", "discount" -> "l_discount")) {
      val slice = long.filter(col("measure") === m)
        .select(col("l_orderkey"), col("l_linenumber"), col("value"))
      val src = base.select(col("l_orderkey"), col("l_linenumber"),
        col(c).as("value"))
      assert(slice.exceptAll(src).count() === 0, s"extra rows for $m")
      assert(src.exceptAll(slice).count() === 0, s"missing rows for $m")
    }
  }

  test("q55 extremum-by: top_order really is the argmax of the composite") {
    val got = SparkEntry.queries("q55_extremum_by")(spark, sf)
      .select("o_orderpriority", "top_order").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val composite = round(col("o_totalprice") * 100, 0).cast("bigint") *
      lit(10000000L) + col("o_orderkey")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority").orderBy(col("c").desc)
    val want = Tables.orders(spark, sf)
      .withColumn("c", composite)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("o_orderpriority", "o_orderkey").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("q56 map round trip equals the plain GROUP BY") {
    val got = SparkEntry.queries("q56_map_functions")(spark, sf)
    val plain = Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).as("order_year"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"))
    assert(got.select("order_year", "status", "n").exceptAll(plain).count() === 0)
    assert(plain.exceptAll(got.select("order_year", "status", "n")).count() === 0)
    // n_statuses = per-year map cardinality = distinct statuses
    val card = got.select("order_year", "n_statuses").distinct().collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val want = plain.groupBy("order_year")
      .agg(countDistinct("status").cast("int").as("k")).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(card === want)
  }

  test("q57 bloom prefilter ≡ plain semi join (no false negatives)") {
    val got = SparkEntry.queries("q57_bloom_prefilter")(spark, sf)
    val keys = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val plain = Tables.orders(spark, sf)
      .join(keys, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("o_totalprice") * 100, 0).cast("bigint"))
          .cast("double") / 100.0, 2).as("revenue"))
      .orderBy("o_orderpriority")
    assert(got.collect().toSeq === plain.collect().toSeq)
    // the probe must be the codegen'd BloomFilterMightContain
    // expression, not a Scala UDF — pin the plan shape
    val phys = got.queryExecution.executedPlan.toString
    assert(phys.contains("might_contain"), "bloom probe missing from plan")
    assert(!phys.contains("UDF"), "bloom probe fell back to a Scala UDF")
  }

  test("v06 recall: multi-probe dominates probe-1, recalls within [0,1]") {
    val rows = SparkEntry.queries("v06_ann_recall")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows.keySet === Set("v02_lsh", "v03_ivf_probe1",
      "v05_ivf_probe2", "v10_pq_flat", "v11_ivfpq"))
    rows.values.foreach(v => assert(v >= 0.0 && v <= 1.0, s"recall $v"))
    // probe-2 searches a superset of probe-1's candidates — its
    // recall can only be >= (the documented "recall lever")
    assert(rows("v05_ivf_probe2") >= rows("v03_ivf_probe1"), rows.toString)
    // IVFPQ's candidates are a subset of the probe-1 cell — its recall
    // cannot exceed exhaustive in-cell search
    assert(rows("v11_ivfpq") <= rows("v03_ivf_probe1"), rows.toString)
  }

  test("v07 k-means build: total assignment, cells within seed range") {
    val a = SparkEntry.queries("v07_ivf_kmeans_build")(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    // every vector lands in exactly one cell, ids within the seed range
    assert(a.length.toLong === n)
    val cells = a.map(_.getInt(1)).toSet
    assert(cells.subsetOf((0 until 8).toSet), cells.toString)
    assert(cells.size > 1, "degenerate single-cell clustering")
    // each seed vector must sit in its own cell after round 1 by
    // construction (distance 0 to itself); after round 2 the partition
    // must still be non-trivial and cover >= 2 cells per 100 vectors
    // — a weak but deterministic sanity floor for the fixed corpus
    assert(cells.size >= math.min(8, (n / 250).toInt).max(2), cells.toString)
  }

  test("v07-built cells SEARCH: probe-1 over the engine-built index " +
      "recalls most exact neighbors") {
    import org.apache.spark.sql.expressions.Window
    // the built index must be usable, not just well-formed: run the
    // v03 probe-1 search shape against v07's cells and measure
    // recall@3 vs the exact top-3 (v01). This closes the loop
    // build → search that v03 leaves open by consuming a given label.
    val cells = SparkEntry.queries("v07_ivf_kmeans_build")(spark, sf)
      .withColumnRenamed("cell", "label")
    PersistRegistry.release()
    val q = 20
    // quantized vectors joined to the BUILT cells
    val n = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 10000).cast("long")).as("r"))
      .withColumn("nn", expr("aggregate(transform(r, x -> x*x), 0L, (a,v) -> a+v)"))
      .join(cells, "vec_id")
    val cent = n.select(col("label"), posexplode(col("r")).as(Seq("j", "v")))
      .groupBy("label", "j").agg(sum("v").as("cj"))
      .groupBy("label").agg(expr(
        "aggregate(array_sort(collect_list(struct(j, cj))), " +
        "cast(array() as array<bigint>), (acc, x) -> concat(acc, array(x.cj)))")
        .as("c"))
      .withColumn("cn", expr("aggregate(transform(c, x -> x*x), 0L, (a,v) -> a+v)")
        .cast("double"))
    val probes = n.filter(col("vec_id") < q)
      .select(col("vec_id").as("query_id"), col("r").as("rq"),
        col("nn").as("nnq"))
      .crossJoin(broadcast(cent))
      .withColumn("sim", expr(
        "aggregate(zip_with(rq, c, (x, y) -> x * y), 0L, (a, v) -> a + v)")
        .cast("double") / sqrt(col("nnq").cast("double") * col("cn")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("label"))))
      .filter(col("rn") === 1).select("query_id", "label", "rq", "nnq")
    val found = probes.join(
        n.select(col("label"), col("vec_id").as("neighbor_id"),
          col("r").as("rc"), col("nn").as("nnc")), Seq("label"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", expr(
        "aggregate(zip_with(rq, rc, (x, y) -> x * y), 0L, (a, v) -> a + v)")
        .cast("double") / sqrt(col("nnq").cast("double") * col("nnc").cast("double")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc,
          col("neighbor_id"))))
      .filter(col("rank") <= 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = SparkEntry.queries("v01_ann_brute_topk")(spark, sf)
      .filter(col("rank") <= 3).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    PersistRegistry.release()
    val recall = (truth & found).size.toDouble / truth.size
    // probe-1 against a 2-round k=8 index: a floor, not a target —
    // the point is the BUILT index retrieves real neighbors at all
    assert(recall >= 0.3, f"recall@3 over built cells = $recall%.3f")
  }

  test("d11 incremental dedup ≡ the d02 pairs that cross the delta split") {
    def bucket(id: Long): Long =
      graft.functions.VectorKernels.md5Hex8(id.toString) % 10
    val d11 = SparkEntry.queries("d11_incremental_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // delta side is bucket 7, corpus side is everything else — strictly
    d11.foreach { case (nw, old) =>
      assert(bucket(nw) === 7L, s"new_doc $nw not in the delta bucket")
      assert(bucket(old) !== 7L, s"dup_of $old inside the delta bucket")
    }
    // the incremental result is exactly the full-corpus d02 pairs with
    // one side in the delta: restricting candidate generation loses
    // nothing (same bands) and invents nothing (same confirm)
    val d02 = SparkEntry.queries("d02_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = d02.flatMap { case (a, b) =>
      if (bucket(a) == 7L && bucket(b) != 7L) Some((a, b))
      else if (bucket(b) == 7L && bucket(a) != 7L) Some((b, a))
      else None
    }.toSet
    assert(d11 === expected)
    assert(d11.nonEmpty, "split produced no cross pairs — widen the delta")
  }

  test("d12 boilerplate strip: counts reconcile, output ⊑ the original text") {
    val rows = SparkEntry.queries("d12_boilerplate_strip")(spark, sf)
      .collect()
    val original = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (id, nSeg, nKept, nDrop, clean) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getString(4))
      assert(nKept + nDrop === nSeg, s"doc $id counts")
      val cleanToks = clean.split("\\s+").filter(_.nonEmpty)
      assert(cleanToks.length === 8 * nKept, s"doc $id token count")
      // every surviving token sequence is a SUBSEQUENCE of the doc's
      // own tokens — stripping never invents or reorders content
      val origToks = original(id).trim.split("\\s+")
      var j = 0
      cleanToks.foreach { tok =>
        while (j < origToks.length && origToks(j) != tok) j += 1
        assert(j < origToks.length, s"doc $id: '$tok' out of order")
        j += 1
      }
    }
    assert(rows.map(_.getLong(3)).sum > 0, "no boilerplate found at all")
    assert(rows.exists(_.getLong(2) > 0), "everything stripped — degenerate")
  }

  test("v08 int8: codes in [-127,127], reconstruction within scale/2") {
    // recompute the declared quantization row-by-row and check the
    // properties the checksum oracle cannot see directly
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
    val out = SparkEntry.queries("v08_int8_quantize")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size === rows.length)
    rows.foreach { r =>
      val id = r.getLong(0)
      val xs = r.getSeq[Float](1).map(_.toDouble)
      val scale = out(id)
      assert(math.abs(scale - xs.map(math.abs).max / 127) < 1e-15)
      xs.foreach { x =>
        val q = math.floor(x / scale + 0.5)
        assert(q >= -127 && q <= 127, s"vec $id code $q out of range")
        assert(math.abs(q * scale - x) <= scale / 2 + 1e-12,
          s"vec $id reconstruction error above the half-step bound")
      }
    }
  }

  test("q58 histogram: buckets partition the data, extents inside bounds") {
    val rows = SparkEntry.queries("q58_histogram")(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total === Tables.orders(spark, sf).count())
    rows.foreach { r =>
      val (b, lo, hi) = (r.getInt(0), r.getDouble(2), r.getDouble(3))
      assert(lo >= b * 25000.0 && hi < (b + 1) * 25000.0,
        s"bucket $b extent [$lo,$hi] outside bounds")
    }
  }

  test("q59 gap fill: spine is dense, observed days exact, fill carries") {
    import spark.implicits._
    val out = SparkEntry.queries("q59_gap_fill")(spark, sf)
      .select("user_id", "day", "v")
      .as[(Long, java.sql.Date, Option[Double])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime)).toMap
    for ((_, days) <- out) {
      // dense daily spine: consecutive days differ by exactly 86400 s
      days.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0)._2, pair(1)._2)
        assert(b.toLocalDate.toEpochDay - a.toLocalDate.toEpochDay === 1)
      }
      // first day is observed (spine starts at min observed day)
      assert(days.head._3.nonEmpty)
      // forward fill ⇒ no null after the first day
      days.foreach { case (_, _, v) => assert(v.nonEmpty) }
    }
  }

  test("s05 interval join: every pair inside the bound, none missed") {
    import spark.implicits._
    val got = SparkEntry.queries("s05_interval_join")(spark, sf)
      .select("click_id", "view_id", "click_us", "view_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    got.foreach { case (_, _, cUs, vUs) =>
      assert(vUs <= cUs && cUs - vUs < 3600L * 1000 * 1000)
    }
    // brute-force cross check on the driver
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, String, Long)].collect()
    val clicks = ev.filter(_._3 == "click")
    val views = ev.filter(_._3 == "view").groupBy(_._2)
    val want = (for {
      c <- clicks
      v <- views.getOrElse(c._2, Array.empty[(Long, Long, String, Long)])
      if v._4 <= c._4 && c._4 - v._4 < 3600L * 1000 * 1000
    } yield (c._1, v._1, c._4, v._4)).toSet
    assert(got === want)
  }

  test("q60 CMS: estimates never undercount, exact when k-distinct is small") {
    val rows = SparkEntry.queries("q60_cms_freq")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS underestimated: $est < $exact")
    }
  }

  test("d09 cell-blocked near-dup pairs ⊆ d05 brute-force pairs") {
    import spark.implicits._
    val blocked = SparkEntry.queries("d09_ivf_neardup")(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = SparkEntry.queries("d05_embedding_neardup")(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(brute),
      s"cell blocking invented pairs: ${blocked.diff(brute).take(3)}")
    // and blocking = exactly the brute pairs whose members share a cell
    val cells = Tables.embeddings(spark, sf)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(blocked === brute.filter { case (a, b) => cells(a) == cells(b) })
  }

  test("t13: frequency sums are consistent with the token counts") {
    import spark.implicits._
    val rows = SparkEntry.queries("t13_doc_token_freq")(spark, sf)
      .select("doc_id", "n_tokens", "freq_sum", "max_freq", "mean_freq_e4")
      .as[(Long, Long, Long, Long, Long)].collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length === nDocs)
    val totalTokens = rows.map(_._2).sum
    rows.foreach { case (_, n, fs, mf, mean) =>
      assert(fs >= n)           // every token occurs at least once
      assert(mf <= totalTokens) // no count above the corpus size
      assert(mean === fs * 10000 / n)
    }
  }

  test("v05 multi-probe dominates probe-1: top-3 cosines elementwise >=") {
    import spark.implicits._
    def top3(name: String): Map[(Long, Int), Double] =
      SparkEntry.queries(name)(spark, sf)
        .select("query_id", "rank", "cos_sim")
        .as[(Long, Int, Double)].collect()
        .map { case (q, r, c) => (q, r) -> c }.toMap
    val p1 = top3("v03_ann_ivf_cell")
    val p2 = top3("v05_ann_ivf_multiprobe")
    // probe-2's candidate set is a superset, so at every rank its
    // cosine is at least probe-1's
    p1.foreach { case ((q, r), c1) =>
      p2.get((q, r)).foreach(c2 => assert(c2 >= c1,
        s"probe-2 regressed query $q rank $r: $c2 < $c1"))
    }
  }

  test("m04 resize: output length is min(len, width); values are byte means") {
    import spark.implicits._
    val media = Seq(
      (1L, "x" * 200),   // long: 64 buckets
      (2L, "abc"),       // shorter than width: one bucket per byte
      (3L, "")           // empty: no buckets
    ).toDF("doc_id", "text")
      .select(col("doc_id"), lit("blob/t").as("format"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(octet_length(col("text")).as("n_bytes"),
          lit("en").as("lang")).as("meta"))
    val out = graft.multimodal.MediaOps.resize(spark, media)
      .select("doc_id", "out_len", "resized")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Int](2))).toMap
    assert(out(1L)._1 === 64)
    assert(out(1L)._2.forall(_ === 'x'.toInt)) // uniform signal resizes flat
    assert(out(2L) === ((3, Seq('a'.toInt, 'b'.toInt, 'c'.toInt))))
    assert(out(3L)._1 === 0)
  }

  test("t12: planted decomposed text always composes (len shrinks by 2)") {
    val rows = SparkEntry.queries("t12_nfc_normalize")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getInt(1) - r.getInt(2) === 2) // two combining marks fused
      assert(r.getBoolean(3))                 // changed = true everywhere
    }
  }
}
