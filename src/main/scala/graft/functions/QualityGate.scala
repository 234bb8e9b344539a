package graft.functions

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Quality gate with single-pass observability: filter a corpus on
  * quality signals AND collect the acceptance metrics in the same job
  * via `observe()` — no second scan over 100 TB just to count what
  * was dropped.
  *
  * The returned Observation yields (after the DataFrame is consumed):
  *   n_total, n_kept, n_too_short, n_too_repetitive — the numbers a
  *   pipeline run must log for every filtering stage (silent-drop
  *   pipelines are undebuggable at scale; SURVEY's "no silent caps"
  *   rule applied to row filtering).
  */
object QualityGate {

  final case class Gated(df: DataFrame, observation: Observation)

  /** The scoring + bucket columns (no metrics, no filtering) — shared
    * by the observed batch gate and the streaming gate (`observe()`
    * rejects streaming Datasets, and streaming metrics flow through
    * StreamingQueryProgress instead). */
  private def scoreDocuments(docs: DataFrame, minTokens: Int,
      maxRepetition: Double): DataFrame = docs
      .withColumn("__w", split(trim(col("text")), "\\s+"))
      .withColumn("__n_tokens", size(col("__w")))
      .withColumn("__gs", transform(
        sequence(lit(1), greatest(size(col("__w")) - 4, lit(1))),
        i => concat_ws(" ", slice(col("__w"), i, lit(5)))))
      .withColumn("__rep",
        (size(col("__gs")) - size(array_distinct(col("__gs")))).cast("double")
          / size(col("__gs")))
      // null-safe: a null text is its own (dropped + counted) bucket —
      // a quality gate must never drop rows it does not count
      .withColumn("__null", col("text").isNull)
      .withColumn("__short", !col("__null") && col("__n_tokens") < minTokens)
      .withColumn("__repetitive", !col("__null") && !col("__short")
        && col("__rep") >= maxRepetition)
      .withColumn("__keep",
        !col("__null") && !col("__short") && !col("__repetitive"))

  private val scratchCols = Seq("__w", "__n_tokens", "__gs", "__rep",
    "__null", "__short", "__repetitive", "__keep")

  /** Keep documents with >= minTokens tokens and < maxRepetition
    * duplicate-5-gram ratio. Metrics reconcile exactly:
    * n_total = n_kept + n_null + n_too_short + n_too_repetitive
    * (buckets are mutually exclusive, checked in priority order). */
  def filterDocuments(docs: DataFrame, minTokens: Int = 20,
      maxRepetition: Double = 0.5): Gated = {
    val obs = Observation()
    val scored = scoreDocuments(docs, minTokens, maxRepetition)
    val observed = scored.observe(obs,
      count(lit(1)).as("n_total"),
      sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("__null"), 1L).otherwise(0L)).as("n_null"),
      sum(when(col("__short"), 1L).otherwise(0L)).as("n_too_short"),
      sum(when(col("__repetitive"), 1L).otherwise(0L)).as("n_too_repetitive"))
    Gated(
      observed.filter(col("__keep")).drop(scratchCols: _*),
      obs)
  }

  /** Streaming-safe gate: identical keep/drop semantics, no
    * Observation (unsupported on streams — use the query's progress
    * metrics or a custom listener for streaming accounting). */
  def filterStream(docs: DataFrame, minTokens: Int = 20,
      maxRepetition: Double = 0.5): DataFrame =
    scoreDocuments(docs, minTokens, maxRepetition)
      .filter(col("__keep")).drop(scratchCols: _*)
}
