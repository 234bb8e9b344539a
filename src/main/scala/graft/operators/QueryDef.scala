package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a Spark builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
  * over the same parquet tables.
  *
  * Parity rules (driver hash-compares values after sorting columns by
  * name — see the builder contract):
  *   - every computed column is aliased identically on both sides;
  *   - every floating aggregate is `round(x, 2)` on both sides so
  *     summation-order ulp noise cannot flip the hash;
  *   - every query ends in a total deterministic ORDER BY.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
