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
    // salt = hash(key, per-row id): spreads even byte-identical
    // duplicate rows of a hot key (a whole-row hash would send them
    // all to one bucket — the straggler this operator exists to
    // prevent), and avoids hashing unhashable column types (MapType).
    // The salt value itself never affects the join RESULT — any
    // assignment joins each left row to the one matching right
    // replica — so the id's non-determinism across retries is fine.
    val salted = left.as("l").withColumn(salt,
      pmod(hash(col(s"l.$leftKey"), monotonically_increasing_id()),
        lit(saltFactor)))
    val replicated = right.as("r").withColumn(salt,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        col(s"l.$leftKey") === col(s"r.$rightKey")
          && salted(salt) === replicated(salt))
      .drop(salt)
  }
}
