package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextKernels.{mdBucket, mdBucketSql, mdHash60,
  mdHash60Sql}
import graft.sources.Tables

/** Dataset-splitting / sampling operators for the training-data
  * pipeline. Both are DETERMINISTIC (hash-of-key, not rng): the split
  * a document lands in is a pure function of its id, so re-running the
  * pipeline — on any cluster size, any partitioning — reproduces the
  * exact same train/val/test membership. That reproducibility is the
  * property that matters at 100 TB: rng-based sample() is partition-
  * order-dependent and cannot be oracle-checked or re-derived.
  *
  * Hash recipe shared by both engines: first 8 hex chars of
  * md5(key-as-string) read as a base-16 integer, mod k → a uniform
  * bucket in [0, k). Both the Spark Column form and the DuckDB
  * oracle fragment come from ONE definition —
  * `TextKernels.mdBucket` / `mdBucketSql` — so the engine and its
  * declared oracle cannot drift apart. Map-only (no shuffle except
  * the oracle ORDER BY); the filter is codegen'd.
  */
object SamplingQueries {

  private val bucket = mdBucket(col("doc_id"), 100)

  val all: Seq[QueryDef] = Seq(

    // Train/val/test split (80/10/10) by hashed doc_id.
    QueryDef(
      "p01_hash_split",
      raw"""SELECT doc_id,
        |       CASE WHEN b < 80 THEN 'train'
        |            WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, ${mdBucketSql("doc_id", 100)} AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },

    // Stratified deterministic sample: 20% of each source stratum
    // (bucket < 20 within the stratum's own key space — doc_id is
    // uniform within every stratum, so each stratum is sampled at the
    // same rate regardless of its size; no shuffle, unlike sampleBy).
    QueryDef(
      "p02_stratified_sample",
      raw"""SELECT source, count(*) AS n_sampled,
        |       count(DISTINCT doc_id) AS n_distinct
        |FROM (SELECT source, doc_id, ${mdBucketSql("doc_id", 100)} AS b
        |      FROM documents)
        |WHERE b < 20
        |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .filter(bucket < 20)
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled"),
          count_distinct(col("doc_id")).as("n_distinct"))
        .orderBy("source")
    },

    // Sequence packing (next-fit): assign each document to the
    // 2048-token context-window pack where its first token lands,
    // given a deterministic order. Packing is inherently sequential,
    // so the scalable form shards first (16 md5-shards here; O(10k) on
    // a real cluster): within a shard a running-sum window computes
    // each doc's start offset, and pack_id = shard ⊕ offset/budget.
    // One shuffle on the shard key; shards are independent, so the
    // sequential scan parallelizes across them and the result is
    // reproducible on any partitioning.
    QueryDef(
      "p03_pack_sequences",
      raw"""WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |           AS n_tok,
        |         ${mdBucketSql("doc_id", 16)} AS shard
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok, shard,
        |        CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM t)
        |SELECT doc_id, n_tok,
        |       shard * 1000000000000 +
        |       CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val shard = mdBucket(col("doc_id"), 16)
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tok"),
          shard.as("shard"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        // 1e12 packs of headroom per shard: at 100 TB a shard can hold
        // ~6e8 packs, so a 1e6 multiplier would collide across shards
        .select(col("doc_id"), col("n_tok"),
          (col("shard") * 1000000000000L +
            floor((col("cum") - col("n_tok")) / 2048.0).cast("bigint"))
            .as("pack_id"))
        .orderBy("doc_id")
    },

    // Source-mixture resampling: downsample each source to a TARGET
    // mixture rate (high-quality sources kept at 60%, mid at 35%,
    // tail at 15%) — the corpus-weighting step of LLM data prep.
    // Same md5-bucket determinism as p01/p02; the per-source rate is
    // one codegen'd CASE, so the op stays a map-only filter with a
    // tiny count aggregate on top.
    QueryDef(
      "p05_mixture_resample",
      raw"""WITH t AS (SELECT source, doc_id,
        |        ${mdBucketSql("doc_id", 100)} AS b
        |      FROM documents)
        |SELECT source, count(*) AS n_kept
        |FROM t
        |WHERE b < CASE WHEN source IN ('src0','src1','src2','src3') THEN 60
        |              WHEN source IN ('src4','src5','src6','src7') THEN 35
        |              ELSE 15 END
        |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val rate = when(col("source").isin("src0", "src1", "src2", "src3"), 60)
        .when(col("source").isin("src4", "src5", "src6", "src7"), 35)
        .otherwise(15)
      Tables.documents(s, d)
        .filter(bucket < rate)
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
        .orderBy("source")
    },

    // Deterministic global training-order shuffle: md5(doc_id) is the
    // sort key, sharded so each data-loader shard gets its own
    // independently-ordered slice. row_number runs PER SHARD (the
    // window partitions on shard — no single-partition global window),
    // so the op is one shuffle + per-shard sort, reproducible bit-for-
    // bit on any cluster: epoch reshuffling = salt the md5 with the
    // epoch number.
    QueryDef(
      "p04_train_order",
      raw"""SELECT doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY shard
        |              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |         AS pos_in_shard
        |FROM (SELECT doc_id, ${mdBucketSql("doc_id", 8)} AS shard
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val shard = mdBucket(col("doc_id"), 8)
      val w = Window.partitionBy("shard")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), shard.as("shard"))
        .withColumn("pos_in_shard", row_number().over(w).cast("bigint"))
        .orderBy("doc_id")
    },

    // Token-budget mixture plan — the sizing arithmetic behind every
    // LLM data recipe: given tier weights (hi 50 / mid 30 / tail 20 —
    // p05's tiers) and a 10M-token budget, how many target tokens each
    // source contributes (its tier's share split evenly across the
    // tier's sources) and how many EPOCHS of the source that implies
    // (>1000‰ = the source must repeat; ≪1000‰ = it is subsampled).
    // Everything integer (div of non-negatives) so both engines agree
    // exactly. Shape: one scan with a map-side-combined groupBy on
    // source (~#sources groups), then a broadcast join against the
    // 3-row tier-count aggregate — the plan output is O(#sources)
    // regardless of corpus size.
    QueryDef(
      "p06_token_budget_plan",
      """WITH t AS (SELECT source,
        |        CASE WHEN source IN ('src0','src1','src2','src3') THEN 'hi'
        |             WHEN source IN ('src4','src5','src6','src7') THEN 'mid'
        |             ELSE 'tail' END AS tier,
        |        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |          AS n_tok
        |      FROM documents),
        |s AS (SELECT source, tier, count(*) AS n_docs,
        |             CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |      FROM t GROUP BY source, tier),
        |c AS (SELECT tier, count(*) AS n_sources FROM s GROUP BY tier),
        |p AS (SELECT source, s.tier, n_docs, n_tokens,
        |        CAST((10000000 * CASE s.tier WHEN 'hi' THEN 50
        |                                     WHEN 'mid' THEN 30
        |                                     ELSE 20 END)
        |             // (100 * c.n_sources) AS BIGINT) AS target_tokens
        |      FROM s JOIN c ON s.tier = c.tier)
        |SELECT source, tier, n_docs, n_tokens, target_tokens,
        |       CAST((target_tokens * 1000) // n_tokens AS BIGINT)
        |         AS epochs_x1000
        |FROM p ORDER BY source""".stripMargin) { (s, d) =>
      val tier = when(col("source").isin("src0", "src1", "src2", "src3"), "hi")
        .when(col("source").isin("src4", "src5", "src6", "src7"), "mid")
        .otherwise("tail")
      val perSource = Tables.documents(s, d)
        .select(col("source"), tier.as("tier"),
          size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tok"))
        .groupBy("source", "tier")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").cast("bigint").as("n_tokens"))
      val tierCounts = perSource.groupBy("tier")
        .agg(count(lit(1)).as("n_sources"))
      perSource.join(broadcast(tierCounts), "tier")
        .selectExpr("source", "tier", "n_docs", "n_tokens",
          """CAST((10000000 * CASE tier WHEN 'hi' THEN 50
            |                           WHEN 'mid' THEN 30
            |                           ELSE 20 END)
            |     div (100 * n_sources) AS BIGINT) AS target_tokens"""
            .stripMargin)
        .selectExpr("source", "tier", "n_docs", "n_tokens", "target_tokens",
          "CAST((target_tokens * 1000) div n_tokens AS BIGINT) AS epochs_x1000")
        .orderBy("source")
    },

    // Filter-funnel audit — the per-stage survival report every
    // production pipeline publishes with a corpus release: how many
    // documents enter and leave each cleaning stage (language keep →
    // length band → mean-token-length quality band → exact-prefix
    // dedup keeping the smallest doc_id per d01 key). ONE scan
    // computes all stage flags as running conjunctions (a doc's fate
    // at stage k is a pure function of its row + the dedup window);
    // the only shuffle is the dedup stage's window on the d01 prefix
    // key — the same key d01 groups on, so the funnel costs one
    // hash-partition pass at any corpus size. The integer quality band
    // uses div (non-negative) so both engines agree exactly.
    QueryDef(
      "p07_filter_funnel",
      """WITH b AS (SELECT doc_id, lang, n_chars,
        |        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |          AS n_tok,
        |        md5(array_to_string(
        |          (string_split_regex(trim(text), '\s+'))[1:8], ' '))
        |          AS key_hash
        |      FROM documents),
        |f AS (SELECT doc_id, key_hash,
        |        (lang IN ('en','de','es','fr')) AS f1,
        |        (lang IN ('en','de','es','fr')
        |         AND n_chars BETWEEN 100 AND 500) AS f2,
        |        (lang IN ('en','de','es','fr')
        |         AND n_chars BETWEEN 100 AND 500
        |         AND (n_chars * 100) // n_tok BETWEEN 400 AND 800) AS f3
        |      FROM b),
        |g AS (SELECT f1, f2, f3,
        |        (f3 AND doc_id = min(CASE WHEN f3 THEN doc_id END)
        |           OVER (PARTITION BY key_hash)) AS f4
        |      FROM f),
        |a AS (SELECT count(*) AS n0,
        |        CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |        CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |        CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        |        CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
        |      FROM g)
        |SELECT stage, n_in, n_out FROM (
        |  SELECT '1_lang' AS stage, n0 AS n_in, n1 AS n_out FROM a
        |  UNION ALL SELECT '2_length', n1, n2 FROM a
        |  UNION ALL SELECT '3_quality', n2, n3 FROM a
        |  UNION ALL SELECT '4_dedup', n3, n4 FROM a) u
        |ORDER BY stage""".stripMargin) { (s, d) =>
      val ws = split(trim(col("text")), "\\s+")
      val b = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(ws).cast("bigint").as("n_tok"),
          md5(concat_ws(" ", slice(ws, 1, 8))).as("key_hash"))
      val f1 = col("lang").isin("en", "de", "es", "fr")
      val f2 = f1 && col("n_chars").between(100, 500)
      val f3 = f2 && expr("(n_chars * 100) div n_tok").between(400, 800)
      val wK = Window.partitionBy("key_hash")
      val g = b
        .select(col("doc_id"), col("key_hash"),
          f1.as("f1"), f2.as("f2"), f3.as("f3"))
        .withColumn("f4", col("f3") &&
          col("doc_id") === min(when(col("f3"), col("doc_id"))).over(wK))
      g.agg(count(lit(1)).as("n0"),
          sum(when(col("f1"), 1).otherwise(0)).cast("bigint").as("n1"),
          sum(when(col("f2"), 1).otherwise(0)).cast("bigint").as("n2"),
          sum(when(col("f3"), 1).otherwise(0)).cast("bigint").as("n3"),
          sum(when(col("f4"), 1).otherwise(0)).cast("bigint").as("n4"))
        .selectExpr("""explode(array(
          |  named_struct('stage', '1_lang',    'n_in', n0, 'n_out', n1),
          |  named_struct('stage', '2_length',  'n_in', n1, 'n_out', n2),
          |  named_struct('stage', '3_quality', 'n_in', n2, 'n_out', n3),
          |  named_struct('stage', '4_dedup',   'n_in', n3, 'n_out', n4)))
          |  AS st""".stripMargin)
        .select(col("st.stage").as("stage"), col("st.n_in").as("n_in"),
          col("st.n_out").as("n_out"))
        .orderBy("stage")
    },

    // Token-BALANCED sharding (serpentine / boustrophedon greedy):
    // docs sorted by token count descending are dealt across 8 shards
    // back-and-forth (pass 0: shards 0..7, pass 1: 7..0, ...), which
    // bounds the heaviest-minus-lightest shard gap by one document —
    // the data-loader balance a plain hash shard cannot give when doc
    // lengths are skewed. The global rank that drives the deal is
    // computed the SCALABLE way, not with a single-partition window:
    // range-repartition on the sort key (persisted — the range
    // boundaries are sampled per job, so the pid column must be
    // pinned once), per-partition row_number, plus a broadcast
    // cumulative offset from the tiny per-partition counts — the only
    // global window runs over ≤32 count rows. rank = offset + local
    // row_number is partition-assignment-invariant because the sort
    // key is total (doc_id tiebreak), so the declared semantics below
    // (the oracle's plain row_number) are reproduced exactly.
    QueryDef(
      "p08_balanced_shards",
      """WITH t AS (SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |           AS n_tok
        |       FROM documents),
        |r AS (SELECT doc_id, n_tok,
        |        CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id)
        |             AS BIGINT) - 1 AS rn0
        |      FROM t)
        |SELECT doc_id, n_tok,
        |       CAST(CASE WHEN (rn0 // 8) % 2 = 0 THEN rn0 % 8
        |                 ELSE 7 - (rn0 % 8) END AS INT) AS shard
        |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tok"))
      val parts = graft.PersistRegistry.cached(
        t.repartitionByRange(32, col("n_tok").desc, col("doc_id"))
          .withColumn("pid", spark_partition_id()))
      // ≤32 pid rows by construction; the constant partition key keeps
      // WindowExec's unpartitioned-window warning for real offenders
      // (pmod, not a literal — foldable keys get optimized away)
      val wOff = Window.partitionBy(pmod(col("pid"), lit(1))).orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = parts.groupBy("pid").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum("cnt").over(wOff), lit(0L)))
        .select("pid", "off")
      val wLocal = Window.partitionBy("pid")
        .orderBy(col("n_tok").desc, col("doc_id"))
      parts.join(broadcast(offsets), "pid")
        .withColumn("rn0", col("off") + row_number().over(wLocal) - 1)
        .select(col("doc_id"), col("n_tok"),
          when(expr("(rn0 div 8) % 2") === 0, col("rn0") % 8)
            .otherwise(lit(7) - col("rn0") % 8).cast("int").as("shard"))
        .orderBy("doc_id")
    },

    // DSIR-style importance weights (Data Selection via Importance
    // Resampling): score every raw-corpus document by how much it
    // looks like the TARGET distribution (the hi-tier sources,
    // standing in for "curated quality data") under hashed unigram
    // features — md5-bucketed tokens into 64 bins, Laplace-smoothed
    // log-likelihood ratio log2(p_target(b)/p_raw(b)) averaged over
    // the doc's tokens. The resampling step then keeps docs by weight
    // (p05's bucket trick applies); the weight itself is this op.
    // Scale: both feature histograms are 64-row aggregates (map-side
    // combined), broadcast back onto the token stream — the stats
    // NEVER scale with the corpus, and the only data-sized shuffles
    // are the two count aggregations and the final per-doc agg.
    // Cross-engine determinism: avg() over per-token doubles is
    // summation-ORDER sensitive (r6 hash flake), so the per-bin LR is
    // quantized to an exact integer in 1e-4 units (floor(x*1e4+0.5) —
    // libm log2 is ulp-stable at 4 decimals, proven by t14/v15/q64)
    // and the per-doc mean is an INTEGER sum divided once; the final
    // 2-decimal value uses the shared floor(x+0.5) rounding rule, so
    // no order-dependent float addition survives anywhere.
    QueryDef(
      "p09_dsir_weights",
      raw"""WITH tok AS (SELECT doc_id, source,
        |        ${mdBucketSql("w", 64)} AS b
        |      FROM (SELECT doc_id, source,
        |              unnest(string_split_regex(trim(text), '\s+')) AS w
        |            FROM documents) t),
        |rc AS (SELECT b, count(*) AS rc FROM tok GROUP BY b),
        |tc AS (SELECT b, count(*) AS tc FROM tok
        |       WHERE source IN ('src0','src1','src2','src3') GROUP BY b),
        |tots AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM tok) AS r_tot,
        |                (SELECT CAST(count(*) AS DOUBLE) FROM tok
        |                 WHERE source IN ('src0','src1','src2','src3'))
        |                  AS t_tot),
        |lr AS (SELECT rc.b,
        |         CAST(floor((log2((coalesce(tc.tc, 0) + 1) / (t_tot + 64))
        |           - log2((rc.rc + 1) / (r_tot + 64))) * 10000 + 0.5)
        |           AS BIGINT) AS lrq
        |       FROM rc LEFT JOIN tc ON rc.b = tc.b, tots)
        |SELECT doc_id, count(*) AS n_tokens,
        |       floor(CAST(sum(lr.lrq) AS DOUBLE) / count(*) / 100 + 0.5)
        |         / 100 AS dsir_lr
        |FROM tok JOIN lr USING (b)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val hi = col("source").isin("src0", "src1", "src2", "src3")
      val tok = graft.PersistRegistry.cached(Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(trim(col("text")), "\\s+")).as("w"))
        .select(col("doc_id"), col("source"),
          mdBucket(col("w"), 64).as("b")))
      val rc = tok.groupBy("b").agg(count(lit(1)).as("rc"))
      val tc = tok.filter(hi).groupBy("b").agg(count(lit(1)).as("tc"))
      val tots = tok.agg(count(lit(1)).cast("double").as("r_tot"),
        sum(when(hi, 1L).otherwise(0L)).cast("double").as("t_tot"))
      val lr = rc.join(tc, Seq("b"), "left")
        .crossJoin(broadcast(tots))
        .select(col("b"),
          floor((log2((coalesce(col("tc"), lit(0L)) + 1).cast("double") /
              (col("t_tot") + 64)) -
            log2((col("rc") + 1).cast("double") / (col("r_tot") + 64))) *
            10000 + 0.5).cast("long").as("lrq"))
      tok.join(broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          (floor(sum(col("lrq")).cast("double") / count(lit(1)) / 100 + 0.5)
            / 100).as("dsir_lr"))
        .orderBy("doc_id")
    },

    // Per-domain document cap (CommonCrawl-style "at most K docs per
    // domain", K=10 here, `source` standing in for the domain):
    // deterministic — keep the K docs with the smallest 60-bit
    // md5(doc_id), a uniform hash rank, so membership is a pure
    // function of the corpus, not of partitioning. The scale problem
    // is the rank: a bare row_number over PARTITION BY domain sorts
    // EVERY doc of every domain — a billion-row sort for a domain
    // that keeps 10. The fix is a hash-threshold PRE-PRUNE: per-domain
    // counts (a broadcast-sized agg) give threshold 4K/cnt on the
    // uniform hv/2^60, cutting the expected window input to ~4K rows
    // per domain REGARDLESS of domain size; the exact rank then runs
    // on survivors only. P(a true top-K row exceeds 4× the expected
    // K-th quantile) is Chernoff-negligible, and a miss is DETECTABLE
    // (a domain with cnt ≥ K returning < K rows → re-run that domain
    // unpruned). Both engines compute the identical prune + rank, so
    // the row set is engine-exact; at sf0.01 every domain has 25 docs
    // (threshold 40/25 → 1.0, prune inactive) — the capped output is
    // exactly the unpruned truth, which the spec pins.
    QueryDef(
      "p10_domain_cap",
      raw"""WITH hv AS (SELECT source, doc_id,
        |        ${mdHash60Sql("doc_id")} AS hv
        |      FROM documents),
        |cnt AS (SELECT source, count(*) AS cnt FROM hv GROUP BY source),
        |pruned AS (SELECT hv.source, doc_id, hv.hv
        |           FROM hv JOIN cnt USING (source)
        |           WHERE CAST(hv.hv AS DOUBLE) / 1152921504606846976.0
        |                 < least(1.0, 40.0 / cnt)),
        |ranked AS (SELECT source, doc_id,
        |             row_number() OVER (PARTITION BY source
        |                                ORDER BY hv, doc_id) AS rk
        |           FROM pruned)
        |SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
        |FROM ranked WHERE rk <= 10 ORDER BY source, rk""".stripMargin) {
      (s, d) =>
      val hv = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          mdHash60(col("doc_id")).as("hv"))
      val cnt = hv.groupBy("source").agg(count(lit(1)).as("cnt"))
      val pruned = hv.join(broadcast(cnt), "source")
        .filter(col("hv").cast("double") / lit(1152921504606846976.0) <
          least(lit(1.0), lit(40.0) / col("cnt")))
      pruned
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(col("hv"), col("doc_id"))))
        .filter(col("rk") <= 10)
        .select(col("source"), col("doc_id"), col("rk").cast("long").as("rk"))
        .orderBy("source", "rk")
    },

    // Temperature-scaled source mixture (the multilingual-LM α-
    // sampling trick, α = 0.5): source weights ∝ sqrt(token mass)
    // instead of ∝ token mass, upsampling low-resource sources; docs
    // are then kept by the deterministic md5-uniform threshold at
    // each source's temperature rate (p05/p10's hv trick), targeting
    // 200 kept docs total. Scale: the mixture stats are one
    // #sources-row agg broadcast back — selection is a map-side
    // filter, no shuffle beyond the count agg. Determinism: sqrt is
    // correctly-rounded IEEE on both engines; the weight is frozen
    // into an exact 1e-6-unit integer BEFORE normalization, so the
    // rate is a pure function of exact integers (one division chain,
    // written identically on both sides).
    QueryDef(
      "p11_temperature_mix",
      raw"""WITH ds AS (SELECT doc_id, source,
        |        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |          AS n_tok,
        |        ${mdHash60Sql("doc_id")} AS hv
        |      FROM documents),
        |st AS (SELECT source, count(*) AS n_docs, sum(n_tok) AS n_tok_s
        |       FROM ds GROUP BY source),
        |qs AS (SELECT source, n_docs,
        |         CAST(floor(sqrt(CAST(n_tok_s AS DOUBLE)) * 1000000 + 0.5)
        |              AS BIGINT) AS q
        |       FROM st),
        |tot AS (SELECT sum(q) AS sumq FROM qs),
        |rt AS (SELECT source,
        |         least(1.0, CAST(200 * q AS DOUBLE) / sumq / n_docs) AS rate
        |       FROM qs, tot)
        |SELECT d.source, doc_id,
        |       CAST(floor(rate * 1000000 + 0.5) AS BIGINT) AS rate_ppm
        |FROM ds d JOIN rt ON d.source = rt.source
        |WHERE CAST(hv AS DOUBLE) / 1152921504606846976.0 < rate
        |ORDER BY d.source, doc_id""".stripMargin) { (s, d) =>
      val ds = graft.PersistRegistry.cached(Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tok"),
          mdHash60(col("doc_id")).as("hv")))
      val st = ds.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tok_s"))
      val qs = st.select(col("source"), col("n_docs"),
        floor(sqrt(col("n_tok_s").cast("double")) * 1000000 + 0.5)
          .cast("long").as("q"))
      val tot = qs.agg(sum("q").as("sumq"))
      val rt = qs.crossJoin(broadcast(tot))
        .select(col("source"),
          least(lit(1.0), (lit(200L) * col("q")).cast("double") /
            col("sumq") / col("n_docs")).as("rate"))
      ds.join(broadcast(rt), "source")
        .filter(col("hv").cast("double") / lit(1152921504606846976.0) <
          col("rate"))
        .select(col("source"), col("doc_id"),
          floor(col("rate") * 1000000 + 0.5).cast("long").as("rate_ppm"))
        .orderBy("source", "doc_id")
    },

    // Curriculum ordering — the "easy first, hard later" training
    // schedule: band documents into phases by an integer quality
    // signal (lexical-diversity permille, the t02 family) against
    // DECLARED absolute thresholds — no global quantile pass, so
    // phase assignment is a pure map stage that scales to any corpus
    // and is stable when the corpus grows (quantile-based phases
    // reshuffle every document when new data arrives; threshold-based
    // ones don't). Within a phase, order is the p04 contract:
    // md5-deterministic shuffle inside md5-assigned shards —
    // partition-invariant, reproducible on any cluster, and the
    // row_number windows are per (phase, shard) so no single-reducer
    // global sort exists anywhere in the plan. A trainer consumes
    // shards in (phase, shard, pos) order.
    QueryDef(
      "p12_curriculum_order",
      raw"""WITH t AS (SELECT doc_id,
        |        CAST(1000 * len(list_distinct(string_split_regex(trim(text), '\s+')))
        |             // len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |          AS qscore
        |      FROM documents),
        |ph AS (SELECT doc_id, qscore,
        |         CAST(CASE WHEN qscore < 450 THEN 0 WHEN qscore < 550 THEN 1
        |                   WHEN qscore < 650 THEN 2 ELSE 3 END AS INT) AS phase,
        |         ${mdBucketSql("doc_id", 8)} AS shard
        |       FROM t)
        |SELECT doc_id, qscore, phase, shard,
        |       CAST(row_number() OVER (PARTITION BY phase, shard
        |              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |         AS pos
        |FROM ph ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("phase", "shard")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("CAST(1000 * size(array_distinct(split(trim(text), '\\\\s+'))) " +
            "AS BIGINT) div size(split(trim(text), '\\\\s+'))").as("qscore"))
        .withColumn("phase",
          when(col("qscore") < 450, 0).when(col("qscore") < 550, 1)
            .when(col("qscore") < 650, 2).otherwise(3).cast("int"))
        .withColumn("shard", mdBucket(col("doc_id"), 8))
        .withColumn("pos", row_number().over(w).cast("bigint"))
        .orderBy("doc_id")
    },

    // Token-budget ENFORCEMENT — executes the sizing arithmetic p06
    // only plans: cut each source to (at most) a declared per-source
    // token budget (800 tokens here), deterministically. The budget is split into
    // per-shard quotas (B div 8 — the remainder is deliberately
    // unallocated, documented under-fill rather than a cross-shard
    // coordination step), docs fill each (source, shard) stream in
    // p04's md5 order, and a doc survives iff its INCLUSIVE running
    // token sum stays within the quota — the cap is never exceeded.
    // Scale: the only non-map stage is the running-sum window over
    // (source, shard) — 8 bounded streams per source, no global sort,
    // no driver pass; the same shape as p03's packing window. The cut
    // is reproducible on any partitioning and stable under corpus
    // growth within a shard-stream's md5 prefix order.
    QueryDef(
      "p13_token_budget_cut",
      raw"""WITH t AS (SELECT doc_id, source,
        |        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |          AS n_tok,
        |        ${mdBucketSql("doc_id", 8)} AS shard
        |      FROM documents),
        |r AS (SELECT doc_id, source, shard, n_tok,
        |        CAST(sum(n_tok) OVER (PARTITION BY source, shard
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS BIGINT) AS cum_tok
        |      FROM t)
        |SELECT doc_id, source, shard, n_tok, cum_tok
        |FROM r WHERE cum_tok <= 800 // 8
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source", "shard")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tok"),
          mdBucket(col("doc_id"), 8).as("shard"))
        .withColumn("cum_tok", sum("n_tok").over(w).cast("bigint"))
        .filter(col("cum_tok") <= lit(800 / 8))
        .orderBy("doc_id")
    },

    // Pack MATERIALIZATION — the model-ready-tensor step p03 only
    // plans: each pack's flattened token-id stream (vocab-hashed ids,
    // docs concatenated in deterministic doc_id order) plus the fill
    // metrics a trainer's data loader audits. The Spark side builds
    // the ACTUAL packed arrays — collect per pack, sort by doc_id,
    // flatten — and the oracle checks their md5 fingerprint (array
    // values fingerprinted, not re-listed: robust to engine list-type
    // differences, identical determinism). Scale: one shuffle on the
    // shard key for the running-sum window (p03's own exchange), one
    // groupBy on pack_id whose groups are bounded by the 2048-token
    // context budget — a pack never grows with the corpus, so the
    // collect_list per group is O(context window), not O(N).
    QueryDef(
      "p14_pack_emit",
      raw"""WITH t AS (
        |  SELECT doc_id,
        |         list_transform(string_split_regex(trim(text), '\s+'),
        |           x -> ${mdBucketSql("x", 32768)}) AS ids,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |           AS n_tok,
        |         ${mdBucketSql("doc_id", 16)} AS shard
        |  FROM documents),
        |c AS (SELECT doc_id, ids, n_tok, shard,
        |        CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |          AS cum
        |      FROM t),
        |p AS (SELECT doc_id, ids, n_tok,
        |        shard * 1000000000000 +
        |        CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS pack_id
        |      FROM c)
        |SELECT pack_id,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(sum(n_tok) * 1000 // 2048 AS BIGINT) AS fill_permille,
        |       md5(array_to_string(flatten(list(ids ORDER BY doc_id)), ','))
        |         AS ids_sig
        |FROM p GROUP BY pack_id ORDER BY pack_id""".stripMargin) { (s, d) =>
      val shard = mdBucket(col("doc_id"), 16)
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"),
          transform(split(trim(col("text")), "\\s+"),
            x => mdBucket(x, 32768)).as("ids"),
          size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tok"),
          shard.as("shard"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(col("doc_id"), col("ids"), col("n_tok"),
          (col("shard") * 1000000000000L +
            floor((col("cum") - col("n_tok")) / 2048.0).cast("bigint"))
            .as("pack_id"))
        .groupBy("pack_id")
        .agg(
          count(lit(1)).cast("bigint").as("n_docs"),
          sum("n_tok").cast("bigint").as("n_tokens"),
          expr("CAST(sum(n_tok) * 1000 div 2048 AS BIGINT)")
            .as("fill_permille"),
          md5(concat_ws(",",
            flatten(transform(
              array_sort(collect_list(struct(col("doc_id"), col("ids")))),
              x => x.getField("ids"))))).as("ids_sig"))
        .orderBy("pack_id")
    },

    // FULL-PIPELINE oracle row for CorpusPrep.prepare — the
    // composition a user of this engine actually runs (quality gate →
    // exact dedup → deterministic split → 32-gram decontamination →
    // sharded next-fit packing), value-checked END TO END rather than
    // only piece-by-piece: the emitted pack_id of every surviving
    // train doc depends on every upstream stage's exact membership
    // decisions, so one hash-equal frame pins the whole chain. The
    // oracle restates each stage in DuckDB SQL from the same declared
    // rules (gate thresholds, md5 buckets via the shared
    // TextKernels dialect, stride-16 char grams, 2048-token budget).
    // Scale: the composition is CorpusPrep's own plan — one dedup
    // groupBy, one gram semi join, one per-shard window; nothing is
    // added for verification beyond the final ORDER BY.
    QueryDef(
      "p15_corpus_prep",
      raw"""WITH w AS (
        |  SELECT doc_id, text,
        |         string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT doc_id, text, len(w) AS n_tokens,
        |         list_transform(generate_series(1, greatest(len(w)-4, 1)),
        |           i -> array_to_string(w[i:i+4], ' ')) AS gs
        |  FROM w),
        |gate AS (
        |  SELECT doc_id, text FROM g
        |  WHERE n_tokens >= 20
        |    AND CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE)
        |        / len(gs) < 0.5),
        |ded AS (
        |  SELECT doc_id, text FROM gate
        |  QUALIFY row_number() OVER (PARTITION BY md5(text)
        |                             ORDER BY doc_id) = 1),
        |sp AS (
        |  SELECT doc_id, text,
        |         CASE WHEN ${mdBucketSql("doc_id", 100)} < 80 THEN 'train'
        |              WHEN ${mdBucketSql("doc_id", 100)} < 90 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM ded),
        |tg AS (
        |  SELECT DISTINCT substr(text, CAST(gs + 1 AS INT), 32) AS gr
        |  FROM sp, unnest(range(0, length(text) - 32 + 1, 16)) t(gs)
        |  WHERE split = 'test' AND length(text) >= 32),
        |contam AS (
        |  SELECT DISTINCT s.doc_id
        |  FROM sp s, unnest(range(0, length(s.text) - 32 + 1, 16)) t(gs)
        |  WHERE s.split = 'train' AND length(s.text) >= 32
        |    AND substr(s.text, CAST(gs + 1 AS INT), 32) IN
        |          (SELECT gr FROM tg)),
        |tr AS (
        |  SELECT doc_id, text FROM sp
        |  WHERE split = 'train'
        |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
        |pk AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |           AS n_tok,
        |         ${mdBucketSql("doc_id", 16)} AS shard
        |  FROM tr),
        |cum AS (
        |  SELECT doc_id, n_tok, shard,
        |         sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS c
        |  FROM pk)
        |SELECT doc_id, n_tok,
        |       CAST(shard * 1000000000000 + floor((c - n_tok) / 2048.0)
        |            AS BIGINT) AS pack_id
        |FROM cum ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.pipeline.CorpusPrep.prepare(s, Tables.documents(s, d))
        .train.select(col("doc_id"), col("n_tok"), col("pack_id"))
        .orderBy("doc_id")
    },

    // SEEDED PER-EPOCH RESHUFFLE — the training-loader order op p04
    // lacks the epoch dimension for: every epoch must present the
    // corpus in a DIFFERENT order (repeated order measurably hurts
    // convergence), yet the whole schedule must be reproducible from
    // one seed on any cluster. Each (seed, epoch, doc) key is
    // md5-hashed once; the hash drives BOTH the epoch's shard
    // assignment (full reshuffle — shards differ across epochs, the
    // distributed analog of reshuffling the sharded dataset between
    // epochs) and the within-shard order (60-bit rank, doc_id
    // tiebreak). Scale: a map-only E-way fan-out plus one
    // (epoch, shard)-keyed window — no global sort, linear in
    // E·N, the p04/p08 partitioning discipline with the epoch
    // dimension added.
    QueryDef(
      "p16_epoch_shuffle",
      raw"""SELECT epoch, doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY epoch, shard
        |              ORDER BY ${mdHash60Sql(
              "'42:' || CAST(epoch AS VARCHAR) || ':' " +
                "|| CAST(doc_id AS VARCHAR)")}, doc_id) AS BIGINT)
        |         AS pos_in_shard
        |FROM (SELECT d.doc_id, CAST(t.epoch AS INT) AS epoch,
        |        ${mdBucketSql(
              "'42:' || CAST(epoch AS VARCHAR) || ':' " +
                "|| CAST(doc_id AS VARCHAR)", 8)} AS shard
        |      FROM documents d, generate_series(0, 2) t(epoch))
        |ORDER BY epoch, doc_id""".stripMargin) { (s, d) =>
      val key = concat(lit("42:"), col("epoch").cast("string"),
        lit(":"), col("doc_id").cast("string"))
      val w = Window.partitionBy("epoch", "shard")
        .orderBy(mdHash60(key), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(2))).as("epoch"))
        .withColumn("shard", mdBucket(key, 8))
        .withColumn("pos_in_shard", row_number().over(w).cast("bigint"))
        .orderBy("epoch", "doc_id")
    },
  )
}
