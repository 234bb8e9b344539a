package graft.operators

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
  )
}
