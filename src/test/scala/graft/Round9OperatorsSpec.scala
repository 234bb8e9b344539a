package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 operator: m06 perceptual-hash (aHash) media near-dup.
  * Semantic properties beyond the value oracle — the probe's planted
  * truth must come back with perfect precision and near-perfect
  * recall, and the distance floor between DISTINCT payloads must
  * stay far above the match radius (the separation that makes the
  * radius meaningful).
  */
class Round9OperatorsSpec extends AnyFunSuite {
  import TestSpark._

  private val TwinShift = 1000000000L

  test("m06: every reported pair is a planted re-encode twin " +
      "(perfect precision) and recall is near-total") {
    val pairs = SparkEntry.queries("m06_phash_neardup")(spark, sf).collect()
    PersistRegistry.release()
    assert(pairs.nonEmpty)
    for (r <- pairs) {
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(a < b)
      assert(b - a === TwinShift,
        s"non-twin pair ($a, $b) — a false positive: two distinct " +
        "payloads matched at Hamming <= 3")
      assert(h >= 0 && h <= 3)
    }
    val eligible = Tables.documents(spark, sf)
      .filter(octet_length(col("text")) >= 128).count()
    // the +1-per-7th-bucket perturbation flips a bit only where a
    // bucket sat within one unit of the mean threshold — most twins
    // land at Hamming 0-3; a deterministic few escape the radius
    assert(pairs.length >= 0.85 * eligible,
      s"recall ${pairs.length}/$eligible below the probe's floor")
  }

  test("m06: twins are only reported for eligible payloads") {
    val ids = SparkEntry.queries("m06_phash_neardup")(spark, sf)
      .select("doc_a").collect().map(_.getLong(0)).toSet
    PersistRegistry.release()
    val eligible = Tables.documents(spark, sf)
      .filter(octet_length(col("text")) >= 128)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(eligible))
  }
}
