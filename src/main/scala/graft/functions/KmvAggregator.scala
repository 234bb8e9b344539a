package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed,
  * MERGEABLE Aggregator: the partial buffer holds at most k distinct
  * hash values, combines map-side, and shuffles k longs per group —
  * the sketch property that lets a 100 TB distinct-count run without
  * shuffling the keys themselves.
  *
  * Estimator: with h the k-th smallest of the distinct 60-bit hashes,
  * est = (k-1) · 2^60 / h; when fewer than k distinct hashes exist the
  * count is exact (the buffer IS the distinct set).
  *
  * Unlike HLL (whose register layout is engine-specific, q29), KMV
  * over an md5-derived hash is DETERMINISTIC and cross-engine
  * reproducible: DuckDB computes the identical estimate from the
  * identical hashes, so the sketch is value-oracle-checkable (q48) —
  * an approximate algorithm with an exact test.
  */
class KmvAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Double] {

  /** Sorted-distinct bounded insert: O(log k) search + O(k) copy. */
  private def insert(buf: Seq[Long], h: Long): Seq[Long] = {
    if (buf.length >= k && h >= buf.last) buf
    else {
      val i = buf.search(h)(Ordering.Long) match {
        case scala.collection.Searching.Found(_) => return buf // dup
        case scala.collection.Searching.InsertionPoint(p) => p
      }
      (buf.take(i) :+ h) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def zero: Seq[Long] = Seq.empty
  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = insert(buf, h)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * math.pow(2.0, 60.0) / buf.last.toDouble

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
