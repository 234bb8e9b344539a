package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min Sketch as a typed, MERGEABLE Aggregator — the frequency
  * sketch that completes the engine's sketch families (HLL q29 /
  * KMV q48 count distinct values; CMS estimates per-item counts).
  *
  * Input: the item's `d` precomputed bucket indices (one per hash
  * row; the query derives them from md5 so both engines hash
  * identically). Buffer: the d×w count matrix, flat. Update is d
  * increments; merge is elementwise sum — commutative + associative,
  * so partial sketches combine map-side and the shuffle carries d·w
  * longs per partition REGARDLESS of row count. That constant-size
  * property is what makes corpus-wide frequency estimation feasible
  * at 100 TB where a exact per-key count would shuffle every key.
  *
  * Estimate (taken downstream): min over rows of the item's bucket
  * count — never an underestimate; collisions only inflate. With
  * md5-derived buckets the whole computation is deterministic and
  * cross-engine reproducible, so the approximate sketch carries an
  * EXACT DuckDB oracle (q60) like KMV does.
  */
class CmsAggregator(d: Int, w: Int)
    extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], buckets: Seq[Int]): Array[Long] = {
    var i = 0
    while (i < d) { buf(i * w + buckets(i)) += 1L; i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** WEIGHTED Count-Min update: each input row contributes `n` to its
  * d bucket cells in one increment — the sketch built over a
  * pre-aggregated (item, count) table is cell-for-cell identical to
  * [[CmsAggregator]] over the raw occurrences (sums reassociate), but
  * the d hash derivations run once per DISTINCT item instead of once
  * per occurrence, and the only data-sized exchange is the count's
  * map-side-combined groupBy (round 20 — guide §2.3, aggregate before
  * you shuffle / hash the collapsed key space). */
class CmsWeightedAggregator(d: Int, w: Int)
    extends Aggregator[(Seq[Int], Long), Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long],
      in: (Seq[Int], Long)): Array[Long] = {
    val (buckets, n) = in
    var i = 0
    while (i < d) { buf(i * w + buckets(i)) += n; i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
