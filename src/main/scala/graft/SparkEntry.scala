package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-domain modules; each entry carries
  * (when SQL-expressible) a DuckDB oracle so the driver can
  * hash-compare values at sf0.01.
  */
object SparkEntry {

  /** All engine capabilities, one QueryDef per operator. */
  def defs: Seq[QueryDef] =
    RelationalQueries.all ++ BoatraceQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ StreamQueries.all ++
      MediaQueries.all ++ SamplingQueries.all ++ QualityQueries.all ++
      ServingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A 3-way join + grouped aggregate — exercises scan, pushdown,
    * broadcast join, shuffle join, and partial aggregation in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_multijoin_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(f => q.name -> f())).toMap
}
