package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic star schema
  * (`/root/testdata/sf*` — see TESTDATA.md / FIXTURES.md §B).
  *
  * Design notes for scale: every loader is a plain parquet scan, so
  * Catalyst predicate pushdown / column pruning applies to whatever is
  * stacked on top. At 100 TB the same call works against a
  * directory of many files (possibly partitioned); nothing here assumes
  * a single file. Callers that need a table repeatedly within one
  * query should rely on Spark's plan-level scan reuse rather than
  * caching eagerly here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's TimestampType (micros) refuses to read directly. Read it
    * as raw long nanos (legacy conf) and truncate to micros with
    * integer division — the same truncation DuckDB applies when it
    * reads nanos into its micro-resolution TIMESTAMP, so oracle
    * comparisons stay exact.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` works (R4-R8 of
    * SURVEY §2.4 — the read_db.py query surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
