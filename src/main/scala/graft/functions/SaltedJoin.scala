package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigating equi-join: salt the skewed (left) side's key into
  * `saltFactor` sub-keys and replicate the right side once per salt,
  * so one hot key's rows spread over `saltFactor` reducers instead of
  * one straggler task.
  *
  * Results are exactly those of the plain inner equi-join (verified by
  * the q30 DuckDB oracle, which states the plain join). AQE's runtime
  * skew-join handles many cases automatically; explicit salting
  * remains the tool when a single key dominates a stage AQE cannot
  * split (e.g. a shuffle feeding an aggregation) or when the skew is
  * known ahead of time — at 100 TB you pick the salt factor from key
  * histograms collected on ingest.
  *
  * Keys are taken by NAME and resolved against each aliased side, so
  * self-joins (the canonical skew case) resolve unambiguously.
  */
object SaltedJoin {

  def inner(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltFactor: Int): DataFrame = {
    // a salt column name no input column can collide with
    val salt = Iterator.from(0).map(i => s"__salt$i")
      .find(n => !left.columns.contains(n) && !right.columns.contains(n)).get
    // deterministic salt: spread left rows by a hash of the whole row
    // (monotonically_increasing_id would also do; hash keeps it
    // content-deterministic for testing)
    val salted = left.as("l").withColumn(salt,
      pmod(hash(struct(left.columns.map(col).toIndexedSeq: _*)),
        lit(saltFactor)))
    val replicated = right.as("r").withColumn(salt,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        col(s"l.$leftKey") === col(s"r.$rightKey")
          && salted(salt) === replicated(salt))
      .drop(salt)
  }
}
