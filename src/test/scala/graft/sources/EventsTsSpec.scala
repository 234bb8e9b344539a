package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.TestSpark

/** Fixture-generation drift guard for the events table's `ts` column.
  *
  * The driver regenerated events.parquet between rounds, switching `ts`
  * from parquet TIMESTAMP(NANOS) (readable only as long nanos under
  * Spark's legacy conf) to TIMESTAMP(MICROS) (loads as TimestampType
  * directly). A loader hard-coded to one generation fails 19 queries on
  * the other — exactly the round-7 regression. These tests pin that
  * `Tables.events` / `normalizeEventsTs` accepts BOTH storage forms and
  * yields identical TimestampType values.
  */
class EventsTsSpec extends AnyFunSuite {
  import TestSpark._

  test("events loader yields TimestampType ts on the current fixture") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }

  test("normalizeEventsTs accepts long-nanos, NTZ, and LTZ ts identically") {
    // stage the same rows in every storage form a fixture generation
    // has used (session tz is UTC, so all three denote the same instants)
    val cur = Tables.events(spark, sf).select("event_id", "ts").limit(100)
    assert(cur.schema("ts").dataType === TimestampType)

    val dir = java.nio.file.Files.createTempDirectory("events_ts_forms")
    // nanos-as-long form: exactly what the legacy conf hands the loader
    // when the fixture stores TIMESTAMP(NANOS)
    cur.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .write.parquet(s"$dir/nanos.parquet")
    // NTZ form: what the current driver fixture stores
    // (isAdjustedToUTC=false micros)
    cur.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.parquet(s"$dir/ntz.parquet")
    cur.write.parquet(s"$dir/ltz.parquet")

    val fromNanos = spark.read.parquet(s"$dir/nanos.parquet")
    val fromNtz   = spark.read.parquet(s"$dir/ntz.parquet")
    assert(fromNanos.schema("ts").dataType === LongType)
    assert(fromNtz.schema("ts").dataType === TimestampNTZType)
    val forms = Seq(fromNanos, fromNtz,
      spark.read.parquet(s"$dir/ltz.parquet")).map(Tables.normalizeEventsTs)
    forms.foreach(f => assert(f.schema("ts").dataType === TimestampType))

    val collected = forms.map(_.orderBy("event_id").collect().toSeq)
    assert(collected(0) === collected(1))
    assert(collected(0) === collected(2))
  }
}
