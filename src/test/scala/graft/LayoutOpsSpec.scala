package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.warehouse.LayoutOps

/** Data-skipping layouts, measured: the same filter over the same rows
  * must READ less after clustering, observed via the scan's emitted
  * row count (parquet row-group pruning off footer min/max stats).
  * This is the write-time half of predicate pushdown — at 100 TB the
  * difference between a selective query costing O(matching row
  * groups) and O(table).
  */
class LayoutOpsSpec extends AnyFunSuite {
  import TestSpark._

  /** Rows the parquet scan EMITS under the filter (post row-group
    * pruning), AQE off so the executed plan is direct. */
  private def scanRows(df: DataFrame): Long = {
    df.queryExecution.executedPlan // force planning
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }
    assert(scans.nonEmpty, "no FileSourceScanExec found")
    scans.sum
  }

  private lazy val dirs: (String, String, String, Long) = {
    val base = java.nio.file.Files.createTempDirectory("layout").toString
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val total = li.count()
    // identical rows, three layouts, 16 files each
    li.repartition(16).write.parquet(s"$base/random")
    LayoutOps.rangeLayout(li, 16, "l_partkey").write.parquet(s"$base/bypart")
    LayoutOps.zorderLayout(li, 16, "l_partkey", "l_suppkey")
      .write.parquet(s"$base/zorder")
    (s"$base/random", s"$base/bypart", s"$base/zorder", total)
  }

  private def withAqeOff[T](body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val orig = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, orig)
  }

  // selective thresholds relative to the actual key domains (the
  // synthetic domains scale with sf)
  private lazy val (p8, p4, s4) = {
    val r = Tables.lineitem(spark, sf)
      .agg(max("l_partkey"), max("l_suppkey")).head
    (r.getLong(0) / 8, r.getLong(0) / 4, r.getLong(1) / 4)
  }

  test("range layout: a selective 1-D filter reads a fraction of the table") {
    withAqeOff {
      val (random, bypart, _, total) = dirs
      val pred = col("l_partkey") < p8
      val r = scanRows(spark.read.parquet(random).filter(pred))
      val s = scanRows(spark.read.parquet(bypart).filter(pred))
      // same answer…
      assert(spark.read.parquet(random).filter(pred).count() ===
        spark.read.parquet(bypart).filter(pred).count())
      // …but the random layout reads everything (every row group spans
      // the key domain) while the clustered one skips
      assert(r === total, s"expected no pruning on random layout, got $r/$total")
      assert(s < total / 3, s"clustered layout read $s of $total rows")
    }
  }

  test("z-order: BOTH dimensions prune; single-col sort only prunes its own") {
    withAqeOff {
      val (random, bypart, zorder, total) = dirs
      val onPart = col("l_partkey") < p4
      val onSupp = col("l_suppkey") < s4
      // second-dimension filter: partkey-sorted layout cannot skip…
      val sortedB = scanRows(spark.read.parquet(bypart).filter(onSupp))
      assert(sortedB > (total * 8) / 10,
        s"single-col sort unexpectedly pruned the other dim: $sortedB/$total")
      // …while z-order clusters row groups into (partkey, suppkey)
      // boxes, so each column's OWN min/max stats turn narrow
      val zA = scanRows(spark.read.parquet(zorder).filter(onPart))
      val zB = scanRows(spark.read.parquet(zorder).filter(onSupp))
      val zBoth = scanRows(spark.read.parquet(zorder)
        .filter(onPart && onSupp))
      assert(zA < (total * 3) / 4, s"z-layout gave weak pruning on dim A: $zA/$total")
      assert(zB < sortedB, s"z-layout should beat single-sort on dim B")
      assert(zBoth <= zA && zBoth <= zB,
        "conjunction must prune at least as hard as either dim")
      // and results are layout-invariant
      assert(spark.read.parquet(zorder).filter(onPart && onSupp).count() ===
        spark.read.parquet(random).filter(onPart && onSupp).count())
    }
  }

  test("zValue interleaves bits correctly") {
    import spark.implicits._
    val rows = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535))
      .toDF("a", "b")
      .select(LayoutOps.zValue(col("a"), col("b")).as("z"))
      .as[Long].collect()
    def morton(a: Int, b: Int): Long =
      (0 until 16).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    val want = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535))
      .map { case (a, b) => morton(a, b) }
    assert(rows.toSeq === want)
  }
}
