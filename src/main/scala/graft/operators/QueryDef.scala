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
    oracle: Option[() => String])

object QueryDef {
  // The oracle is a BY-NAME thunk, forced when SparkEntry.oracleSql is
  // assembled (in Verify, AFTER the queries ran): a generated oracle
  // may depend on knobs the engine sizes from the data at runtime
  // (v20's hop-CTE chain length), and an eagerly-built string would
  // freeze the default knobs at module init.
  def apply(name: String, oracle: => String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(() => oracle))

  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
