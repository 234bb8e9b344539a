package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time LAYOUT operators — the data-skipping lever that turns
  * parquet min/max footer statistics into I/O savings at read time.
  *
  * Parquet row-group pruning is free at the reader (Spark pushes
  * predicates into the scan and skips row groups whose [min,max]
  * cannot match), but it only BITES if the writer clustered values so
  * each row group covers a narrow range. On a randomly-laid-out
  * 100 TB table every row group spans the whole key domain and a
  * selective filter still reads everything; after `rangeLayout` the
  * same filter reads only the files/row groups that overlap the
  * predicate — LayoutOpsSpec measures the scan-emitted row count
  * dropping accordingly.
  *
  * - `rangeLayout`: repartitionByRange + sortWithinPartitions on the
  *   clustering key(s) — optimal skipping for 1-D predicates.
  * - `zorderLayout`: cluster by Morton (Z) code — interleaving the
  *   bits of two keys so range predicates on EITHER or BOTH dimensions
  *   prune (a single-key sort gives perfect pruning on that key and
  *   none on the other; Z-order trades a little of each for skipping
  *   on both — the multi-dimensional clustering production formats
  *   expose as OPTIMIZE ZORDER BY).
  *
  * Both are plain writes — no table format required; SnapshotTable
  * compaction can apply them as its rewrite step.
  */
object LayoutOps {

  /** Range-cluster `df` by `cols` into `nFiles` sorted files. */
  def rangeLayout(df: DataFrame, nFiles: Int, cols: String*): DataFrame =
    df.repartitionByRange(nFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)

  /** Morton (Z-order) code of two non-negative int columns, `bits`
    * bits each, as one long: a.bit(i) → z.bit(2i), b.bit(i) →
    * z.bit(2i+1). Pure shift/or column expressions — whole-stage
    * codegen, no UDF. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Z-order-cluster `df` by two int columns into `nFiles` files.
    *
    * Each dimension is first rescaled to the full `bits` width off its
    * observed max — REQUIRED, not cosmetic: interleaving raw values
    * with unequal domains lets the wider domain own every high bit, so
    * the z-sort degenerates to a plain sort on it and the narrow
    * dimension gets no clustering (and no pruning) at all. One tiny
    * max() job at write time buys balanced boxes in rank space. */
  def zorderLayout(df: DataFrame, nFiles: Int,
      a: String, b: String, bits: Int = 16): DataFrame = {
    val m = df.agg(max(col(a)).cast("long"), max(col(b)).cast("long")).head()
    // max() over zero rows (or all-null dims) yields nulls — an empty
    // table is trivially clustered, return it rather than NPE on the
    // unbox (round-19 review: a restarted delta table is legitimately
    // empty when a maintenance pass re-lays it out)
    if (m.isNullAt(0) || m.isNullAt(1)) return df
    val (ma, mb) = (math.max(m.getLong(0), 1L), math.max(m.getLong(1), 1L))
    val lim = 1L << bits
    // products stay < 2^53, so the double division is exact and the
    // long cast is the integer quotient
    val an = (col(a).cast("long") * lim / (ma + 1)).cast("long")
    val bn = (col(b).cast("long") * lim / (mb + 1)).cast("long")
    df.withColumn("__z", zValue(an, bn, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
