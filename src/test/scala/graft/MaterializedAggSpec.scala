package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.warehouse.MaterializedAgg

/** Incremental materialized aggregate: batch-by-batch refresh must
  * land on exactly the aggregate a full recompute produces (the
  * integer-cents partials make the merge exact, so this is equality,
  * not approximation), while each refresh only does O(batch) +
  * O(touched keys) work and the snapshot layer keeps every
  * intermediate state readable.
  */
class MaterializedAggSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir = java.nio.file.Files
    .createTempDirectory("magg").toString

  test("per-month refreshes converge to the full recompute, exactly") {
    val dir = freshDir
    val orders = Tables.orders(spark, sf)
    val months = orders.select(date_trunc("month", col("o_orderdate")).as("m"))
      .distinct().orderBy("m").collect().map(_.getTimestamp(0))
    // incremental: one refresh per month batch (the per-date ingest)
    months.foreach { m =>
      val batch = orders.filter(date_trunc("month", col("o_orderdate")) === m)
      MaterializedAgg.refresh(spark, dir, batch,
        Seq("o_orderpriority"), "o_totalprice")
    }
    val got = MaterializedAgg.read(spark, dir)
      .select("o_orderpriority", "sum_cents", "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // oracle: one full aggregate over all history
    val want = orders.groupBy("o_orderpriority")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("bigint"))
        .as("sum_cents"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    // snapshot history: one committed version per refresh, and the
    // first version is exactly the first month's aggregate
    assert(graft.warehouse.SnapshotTable.versions(dir).size === months.length)
    val first = orders
      .filter(date_trunc("month", col("o_orderdate")) === months.head)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v0 = MaterializedAgg.read(spark, dir, 0)
      .collect().map(r => r.getAs[String]("o_orderpriority") ->
        r.getAs[Long]("n")).toMap
    assert(v0 === first)
  }

  test("a refresh touching a subset of keys leaves other keys' rows intact") {
    val dir = freshDir
    val orders = Tables.orders(spark, sf)
    MaterializedAgg.refresh(spark, dir, orders,
      Seq("o_orderstatus"), "o_totalprice")
    val before = MaterializedAgg.read(spark, dir)
      .collect().map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("sum_cents"), r.getAs[Long]("n"))).toMap
    // batch containing only status 'F' rows
    val fOnly = orders.filter(col("o_orderstatus") === "F").limit(50)
    val fCents = fOnly.agg(sum(round(col("o_totalprice") * 100, 0)
      .cast("bigint"))).head.getLong(0)
    MaterializedAgg.refresh(spark, dir, fOnly,
      Seq("o_orderstatus"), "o_totalprice")
    val after = MaterializedAgg.read(spark, dir)
      .collect().map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("sum_cents"), r.getAs[Long]("n"))).toMap
    assert(after("F")._1 === before("F")._1 + fCents)
    assert(after("F")._2 === before("F")._2 + 50)
    (before.keySet - "F").foreach(k => assert(after(k) === before(k)))
  }

  test("a retried batchId is skipped; the ledger survives the commit atomically") {
    val dir = freshDir
    val orders = Tables.orders(spark, sf).limit(200)
    val v0 = MaterializedAgg.refresh(spark, dir, orders,
      Seq("o_orderstatus"), "o_totalprice", batchId = 7L)
    val snap = MaterializedAgg.read(spark, dir)
      .collect().map(r => r.getAs[String]("o_orderstatus") ->
        r.getAs[Long]("n")).toMap
    // retry of the SAME epoch: no new version, no double counting
    val v1 = MaterializedAgg.refresh(spark, dir, orders,
      Seq("o_orderstatus"), "o_totalprice", batchId = 7L)
    assert(v1 === v0)
    val after = MaterializedAgg.read(spark, dir)
      .collect().map(r => r.getAs[String]("o_orderstatus") ->
        r.getAs[Long]("n")).toMap
    assert(after === snap)
    // the NEXT epoch applies
    val v2 = MaterializedAgg.refresh(spark, dir, orders,
      Seq("o_orderstatus"), "o_totalprice", batchId = 8L)
    assert(v2 === v0 + 1)
    assert(MaterializedAgg.read(spark, dir)
      .collect().map(_.getAs[Long]("n")).sum === 2 * orders.count())
  }

  test("streaming ingest via foreachBatch refresh equals the batch aggregate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = freshDir
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    // each micro-batch becomes one materialized-aggregate refresh —
    // the streaming front half of the warehouse ingest: state after
    // the stream drains must equal one batch aggregate of everything
    val q = mem.toDF().toDF("o_orderstatus", "o_totalprice")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          MaterializedAgg.refresh(spark, dir, batch,
            Seq("o_orderstatus"), "o_totalprice", batchId = id)
          // simulate the epoch retry foreachBatch contracts for: the
          // batchId ledger (committed atomically with the data) must
          // make the second application a no-op
          MaterializedAgg.refresh(spark, dir, batch,
            Seq("o_orderstatus"), "o_totalprice", batchId = id)
        }
        ()
      }
      .start()
    val rows = Tables.orders(spark, sf)
      .select("o_orderstatus", "o_totalprice")
      .as[(String, Double)].collect()
    try {
      rows.grouped(math.max(rows.length / 4, 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = MaterializedAgg.read(spark, dir)
      .collect().map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("sum_cents"), r.getAs[Long]("n"))).toMap
    val want = Tables.orders(spark, sf).groupBy("o_orderstatus")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("bigint"))
        .as("c"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
  }
}
