package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: exact top-k (value desc, id asc) per group with a
  * bounded buffer — the aggregation form of "top-3 orders per
  * customer".
  *
  * Why it exists next to the window formulation (q10): a window
  * row_number sorts EVERY row of every group; this Aggregator keeps at
  * most k entries per group in the partial buffer, combines
  * map-side, and shuffles only k rows per group — for small k over
  * huge groups that is the difference between shuffling the table and
  * shuffling the answer. (Spark's WindowGroupLimit recovers some of
  * this for the window form; the Aggregator also covers the
  * groupBy/agg shape and custom orderings.)
  *
  * Determinism: total order (value desc, then id asc) — equal values
  * cannot reorder results between runs or engines.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // total order even under NaN (java.lang.Double.compare: NaN sorts
  // above all values, so it can never violate the sort contract)
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // desc
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** O(k) bounded insert into an already-sorted buffer (skip
    * immediately when worse than the current k-th). */
  private def insert(buf: Seq[(Double, Long)],
      x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length >= k && ord.compare(x, buf.last) >= 0) buf
    else {
      val i = buf.indexWhere(e => ord.compare(x, e) < 0) match {
        case -1 => buf.length
        case n => n
      }
      (buf.take(i) :+ x) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
      row: (Long, Double)): Seq[(Double, Long)] =
    insert(buf, (row._2, row._1))

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
