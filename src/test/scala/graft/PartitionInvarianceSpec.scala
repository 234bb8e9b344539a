package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-invariance regression guard: results must be pure
  * functions of the data, not of the parallelism. A representative
  * query from every operator family runs under two different shuffle
  * parallelism settings and must produce identical rows — the
  * property that lets the same code give the same answer on 4 cores
  * and 4,000, and the one that float summation order silently breaks
  * (hence the engine's decimal / integer-cents sum recipes).
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  import TestSpark._

  private val representatives = Seq(
    "q05_groupby_agg",        // integer-cents grouped aggregate
    "q35_exact_percentiles",  // sort-based interpolation
    "q41_stats_agg",          // decimal moment sums
    "q43_asof_custom_exec",   // custom merge exec
    "d02_minhash_lsh",        // kernel + band join
    "d08_dup_clusters",       // iterative fixpoint
    "q59_gap_fill",           // spine generate + join + fill window
    "q60_cms_freq",           // mergeable sketch: merge-order independence
    "t10_vocab_topk",         // partial-agg top-k with tie-break
    "p03_pack_sequences",     // per-shard running-sum window
    "v04_znorm_embeddings",   // broadcast-stat normalization
    "s02_session_stats",      // window sessionization
    "v07_ivf_kmeans_build",   // iterative centroids: partial sums merge
    "d12_boilerplate_strip",  // DF count + order-preserving reassembly
    "v09_pq_encode",          // per-subspace codebook partial sums
    "p07_filter_funnel",      // flag conjunctions + dedup-key window
    "p08_balanced_shards",    // range-repartition + offset global rank
    "t14_lm_quality",         // float avg under round(,2) + token join
    "m05_frame_dedup",        // frame-sig inverted index + pair agg
    "p12_curriculum_order",   // threshold phases + per-shard windows
    "v19_ann_join",           // cell-cogrouped two-table ANN join
    "p13_token_budget_cut",   // per-stream quota running-sum cut
    "p14_pack_emit",          // ordered pack flatten + fingerprint
    "m06_phash_neardup",      // mixed-MIH bands + multi-probe confirm
    "q67_recursive_hierarchy", // recursive frontier joins + rollup
    "v20_graph_beam_search")  // snapshot graph + iterative beam windows

  test("representative queries are identical under different parallelism") {
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    def runAll(parts: String): Map[String, Seq[Seq[Any]]] = {
      spark.conf.set(key, parts)
      representatives.map { n =>
        val rows = SparkEntry.queries(n)(spark, sf).collect().map(_.toSeq).toSeq
        PersistRegistry.release()
        n -> rows
      }.toMap
    }
    try {
      val a = runAll("3")
      val b = runAll("17")
      for (n <- representatives)
        assert(a(n) === b(n), s"$n differs across parallelism settings")
    } finally spark.conf.set(key, orig)
  }
}
