package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * md5(key-as-string) read as a base-16 integer (Spark `conv`,
  * DuckDB `('0x' || substr(...))::BIGINT`), mod 100 → a uniform
  * bucket in [0, 100). Map-only (no shuffle except the oracle
  * ORDER BY); the filter is codegen'd.
  */
object SamplingQueries {

  private val bucket =
    conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100

  val all: Seq[QueryDef] = Seq(

    // Train/val/test split (80/10/10) by hashed doc_id.
    QueryDef(
      "p01_hash_split",
      """SELECT doc_id,
        |       CASE WHEN b < 80 THEN 'train'
        |            WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |          % 100 AS b
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
      """SELECT source, count(*) AS n_sampled,
        |       count(DISTINCT doc_id) AS n_distinct
        |FROM (SELECT source, doc_id,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |          % 100 AS b
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
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |           AS n_tok,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |           % 16 AS shard
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok, shard,
        |        CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM t)
        |SELECT doc_id, n_tok,
        |       shard * 1000000000000 +
        |       CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val shard = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 16
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
      """WITH t AS (SELECT source, doc_id,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |          % 100 AS b
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
      """SELECT doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY shard
        |              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |         AS pos_in_shard
        |FROM (SELECT doc_id,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |          % 8 AS shard
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val shard = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 8
      val w = Window.partitionBy("shard")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), shard.as("shard"))
        .withColumn("pos_in_shard", row_number().over(w).cast("bigint"))
        .orderBy("doc_id")
    },
  )
}
