package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NEGATIVE-RESULT CANARY for the round-18 stretch (byte-pruned walk
  * probes — SCALE_STREAM shows warm-search wall flat to 200× but
  * input bytes linear in corpus, because every hop's broadcast-hash
  * probe scans the whole resident corpus).
  *
  * The cheap lever would have been: persist the serving corpus
  * range-sorted by vec_id and filter each hop by the neighbor-id set
  * — IF InMemoryTableScan's per-batch stats pruning reduced bytes
  * read, a hop would cost ∝ neighbors instead of ∝ corpus. Measured
  * on Spark 4.1 (this spec): bytes read are IDENTICAL for a full
  * scan, a clustered 200-id IN, a scattered IN, a single EqualTo and
  * a contiguous range over a perfectly sorted cached relation — the
  * cached-scan read path reports (and pays the iteration for) every
  * batch of every partition regardless of the filter. The
  * sorted-corpus probe therefore buys NOTHING measurable, and the
  * round-18 decision was to NOT restructure the serving walk around
  * it (the remaining real lever is per-cell persisted sub-frames
  * keyed by a label-carrying serving-edge schema — a format change
  * deferred until the scan term actually dominates a measured
  * budget; walk_hops wall is flat 1×→200× today).
  *
  * If this spec ever FAILS, a Spark upgrade started pruning cached
  * batches under id filters — revisit the optimization, the lever
  * just became real. */
class CachedBatchPruneProbe extends AnyFunSuite {
  import TestSpark._

  test("cached-batch stats pruning does NOT reduce read bytes under " +
      "id filters on a sorted cached relation (Spark 4.1 — the " +
      "pinned negative result behind the round-18 stretch decision)") {
    val sc = spark.sparkContext
    val inputBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit =
        inputBytes.addAndGet(e.stageInfo.taskMetrics.inputMetrics.bytesRead)
    })
    val df = spark.range(0, 2000000)
      .select(col("id").as("vec_id"),
        expr("array_repeat(id, 64)").as("r"))
      .repartitionByRange(8, col("vec_id"))
      .sortWithinPartitions("vec_id")
      .persist()
    try {
      df.count() // fill
      def bytesOf(f: => Long): Long = {
        val b0 = inputBytes.get(); f; Thread.sleep(500)
        inputBytes.get() - b0
      }
      val full = bytesOf(df.filter(col("vec_id") >= 0L).count())
      val clustered = (1000L to 1199L).toSeq
      val cl = bytesOf(df.filter(col("vec_id")
        .isInCollection(clustered)).count())
      val eq = bytesOf(df.filter(col("vec_id") === 1000L).count())
      info(f"full=$full%d clustered_in=$cl%d equal_to=$eq%d")
      assert(full > 0L)
      assert(cl >= full * 9 / 10 && eq >= full * 9 / 10,
        "cached-batch pruning started reducing read bytes — the " +
        "sorted-corpus per-hop probe optimization (round-18 stretch) " +
        "is now worth implementing; see this spec's scaladoc")
    } finally df.unpersist()
  }
}
