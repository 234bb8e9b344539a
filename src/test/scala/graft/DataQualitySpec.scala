package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-quality audit family (a01–a04). Two layers:
  *   1. the clean fixture — every audit reports a healthy corpus
  *      (this is the oracle-checked shape, but asserting it here pins
  *      the SEMANTICS: zero is the required answer, not an accident);
  *   2. a doctored corpus — orders rows deleted (orphaning lineitems),
  *      a column nulled on a key pattern, and the whole table
  *      double-ingested — each audit must detect its corruption with
  *      EXACT counts derived arithmetically from the injected damage.
  * An audit suite that only ever sees clean data never proves its
  * counting paths work; layer 2 is the real test.
  */
class DataQualitySpec extends AnyFunSuite {
  import TestSpark._

  private def rows(name: String, dir: String) = {
    val r = SparkEntry.queries(name)(spark, dir).collect()
    PersistRegistry.release()
    r
  }

  // ---- layer 1: clean fixture ----

  test("a01: profile of clean orders — 6 columns, zero nulls, PK " +
      "distinct == row count") {
    val p = rows("a01_dq_profile", sf)
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(p.size === 6)
    val n = p("o_orderkey")._1
    assert(p.values.forall(_._1 == n), "every column sees every row")
    assert(p.values.forall(_._2 == 0L), "clean fixture has no nulls")
    assert(p("o_orderkey")._3 === n, "PK column: distinct == rows")
    assert(p("o_orderstatus")._3 <= 3L, "low-cardinality status column")
  }

  test("a02: clean fixture has zero orphans on all five FK edges") {
    val e = rows("a02_dq_referential", sf)
    assert(e.length === 5)
    assert(e.forall(_.getLong(2) == 0L),
      e.map(r => s"${r.getString(0)}=${r.getLong(2)}").mkString(","))
    val liRows = Tables.lineitem(spark, sf).count()
    assert(e.filter(_.getString(0).startsWith("lineitem."))
      .forall(_.getLong(1) == liRows), "n_child is the child row count")
  }

  test("a03: hard rules pass on the clean fixture; screens fire with " +
      "counts matching an independent filter") {
    val r = rows("a03_dq_rules", sf)
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(r("lineitem/quantity_range") === 0L)
    assert(r("lineitem/discount_range") === 0L)
    assert(r("orders/positive_total") === 0L)
    val hiDisc = Tables.lineitem(spark, sf)
      .filter(col("l_discount") > 0.08).count()
    assert(r("lineitem/high_discount_screen") === hiDisc)
    assert(hiDisc > 0, "the screen is exercised (nonzero on fixture)")
  }

  test("a04: PK uniqueness — five tables clean; the audit catches the " +
      "fixture's REAL defect (lineitem (l_orderkey, l_linenumber) is " +
      "not unique in the synthetic generator)") {
    val u = rows("a04_dq_uniqueness", sf)
    assert(u.length === 6)
    u.filter(_.getString(0) != "lineitem").foreach { r =>
      assert(r.getLong(3) === 0L, s"${r.getString(0)} dup rows")
      assert(r.getLong(4) === 1L, s"${r.getString(0)} max multiplicity")
    }
    // independent recomputation via dropDuplicates (a different code
    // path than the audit's groupBy count)
    val li = Tables.lineitem(spark, sf)
    val expectedDups = li.count() -
      li.dropDuplicates("l_orderkey", "l_linenumber").count()
    val liRow = u.find(_.getString(0) == "lineitem").get
    assert(expectedDups > 0, "the fixture defect exists")
    assert(liRow.getLong(3) === expectedDups)
    assert(liRow.getLong(4) >= 2L)
  }

  // ---- layer 2: doctored corpus ----

  private lazy val base = {
    // collected once at sf0.001 (1.5k orders) to derive exact
    // expected damage counts arithmetically, independent of the
    // engine's own joins/aggregates
    Tables.orders(spark, sf).select("o_orderkey").collect()
      .map(_.getLong(0))
  }

  private lazy val doctoredDir: String = {
    val d = java.nio.file.Files.createTempDirectory("sf_dq").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (t <- Tables.names if t != "orders")
      spark.read.parquet(s"$sf/$t.parquet")
        .write.parquet(s"$d/$t.parquet")
    // orders: delete every key % 7 == 0 (orphans their lineitems),
    // null o_orderpriority on key % 5 == 0, then double-ingest the
    // whole table
    val kept = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 5 === 0, lit(null: String))
          .otherwise(col("o_orderpriority")))
    kept.unionAll(kept).write.parquet(s"$d/orders.parquet")
    d
  }

  test("a02 detects injected orphans with the exact count") {
    val expectedOrphans = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 7 === 0).count()
    assert(expectedOrphans > 0, "the damage pattern hits the fixture")
    val e = rows("a02_dq_referential", doctoredDir)
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(e("lineitem.l_orderkey->orders") === expectedOrphans)
    assert(e("orders.o_custkey->customer") === 0L,
      "undamaged edges stay clean")
  }

  test("a01 detects injected nulls with the exact count and basis points") {
    val kept = base.filterNot(_ % 7 == 0)
    val nRows = 2L * kept.length
    val nNull = 2L * kept.count(_ % 5 == 0)
    val p = rows("a01_dq_profile", doctoredDir)
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(p("o_orderpriority")._1 === nRows)
    assert(p("o_orderpriority")._2 === nNull)
    assert(p("o_orderpriority")._4 === nNull * 10000 / nRows)
    assert(p("o_orderkey")._2 === 0L, "undamaged column stays clean")
    assert(p("o_orderkey")._3 === kept.length.toLong,
      "distinct keys unchanged by double-ingest")
  }

  test("a04 detects the double-ingest: dup rows == key count, max " +
      "multiplicity == 2") {
    val kept = base.filterNot(_ % 7 == 0)
    val u = rows("a04_dq_uniqueness", doctoredDir)
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(u("orders") === ((2L * kept.length, kept.length.toLong,
      kept.length.toLong, 2L)))
    assert(u("documents")._3 === 0L, "undamaged tables stay clean")
  }
}
