package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9/10 operator: m06 perceptual-hash media near-dup (round 10
  * widened it to a 256-bit multi-offset gradient hash blocked by
  * multi-index Hamming search: 8 x 32-bit bands + adaptive near-tie
  * multi-probe). Semantic properties beyond the value oracle — the
  * probe's planted truth must come back with perfect precision and
  * PERFECT recall (Hamming <= 15 over 8 bands leaves some band with
  * <= 1 differing bit, and that bit is a near-tie the probe rows
  * cover — a guarantee, not a probability), and the distance floor
  * between DISTINCT payloads must stay far above the match radius
  * (the separation that makes the radius meaningful).
  */
class Round9OperatorsSpec extends AnyFunSuite {
  import TestSpark._

  // outside any reachable id space: ScaleCheck's per-copy shift is
  // i*10^9, so twin ids must clear 100 copies' worth of headroom
  private val TwinShift = 1000000000000L

  test("m06: every reported pair is a planted re-encode twin " +
      "(perfect precision) and recall is total") {
    val pairs = SparkEntry.queries("m06_phash_neardup")(spark, sf).collect()
    PersistRegistry.release()
    assert(pairs.nonEmpty)
    for (r <- pairs) {
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(a < b)
      assert(b - a === TwinShift,
        s"non-twin pair ($a, $b) — a false positive: two distinct " +
        "payloads matched at Hamming <= 15 (measured floor is 62)")
      assert(h >= 0 && h <= 15)
    }
    val eligible = Tables.documents(spark, sf)
      .filter(octet_length(col("text")) >= 128).count()
    // MIH pigeonhole: <= 15 flipped bits leave some 32-bit band with
    // <= 1 differing bit, and that bit is a near-tie comparison the
    // multi-probe rows flip — so every twin meets its original on an
    // exact band key and is confirmed inside the radius; recall is
    // exact, not approximate
    assert(pairs.length === eligible,
      s"recall ${pairs.length}/$eligible — the pigeonhole guarantee " +
      "must be exact")
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

  test("q67: the recursion-guard conf is corpus-sized and restored " +
      "after the query — no leak into later queries on the session") {
    val key = "spark.sql.cteRecursionRowLimit"
    val before = spark.conf.get(key)
    // consume the result fully — the guard must already be back at
    // its prior value by the time the query function returns (the
    // recursion is evaluated eagerly inside the guarded scope)
    val df = SparkEntry.queries("q67_recursive_hierarchy")(spark, sf)
    assert(spark.conf.get(key) === before,
      "q67 leaked its recursion-guard conf into the shared session")
    assert(df.count() > 0)
    assert(spark.conf.get(key) === before)
  }

  test("q67: the recursive rollup is a consistent forest invariant") {
    val rows = SparkEntry.queries("q67_recursive_hierarchy")(spark, sf)
      .collect()
    PersistRegistry.release()
    val byNode = rows.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val totalTokens = docs
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    // the root's subtree is the whole corpus
    val (rootDesc, rootTokens, rootHeight) = byNode(0L)
    assert(rootDesc === nDocs)
    assert(rootTokens === totalTokens)
    assert(rootHeight >= 1)
    // every node's subtree is contained in its parent's, strictly
    // monotone counts up the declared parent(d) = (d-1) div 8 chain
    for ((node, (desc, toks, h)) <- byNode if node > 0) {
      val (pDesc, pToks, pH) = byNode((node - 1) / 8)
      assert(pDesc > desc && pToks > toks && pH > h - 1,
        s"parent of $node does not contain its subtree")
    }
    // leaves (no child ids in range) hold exactly themselves
    val maxId = byNode.keys.max
    for ((node, (desc, _, h)) <- byNode if node * 8 + 1 > maxId) {
      assert(desc === 1L && h === 0)
    }
  }
}
