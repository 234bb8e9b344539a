package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Bucketing: the co-located-join layout for repeated large joins
  * (SURVEY §1.4 / the 100 TB design notes). Writing both sides
  * bucketed by the join key lets the sort-merge join run with NO
  * shuffle exchange — at scale this converts the dominant cost of a
  * repeated orders⋈lineitem join into a local merge per bucket.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("join of co-bucketed tables runs without a shuffle exchange") {
    // tables land in the default ./spark-warehouse (gitignored);
    // warehouse.dir is a static conf and cannot move at runtime
    val savedBucketing = spark.conf.get("spark.sql.sources.bucketing.enabled")
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

    try {
      Tables.orders(spark, sf)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.lineitem(spark, sf)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString

      // no Exchange below the join: bucketing provides the required
      // hash distribution on both sides
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join in:\n$plan")
      assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      // values match the unbucketed join
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
        .orderBy("o_orderkey").collect()
      assert(joined.orderBy("o_orderkey").collect().toSeq === expected.toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.sources.bucketing.enabled", savedBucketing)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
    }
  }
}
