package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Columnar/row sink-source round trips beyond the Parquet warehouse:
  * ORC (the other columnar format Spark ships) and header CSV with an
  * explicit read schema (the reference's own sink format, S6).
  */
class SinksSpec extends AnyFunSuite {
  import TestSpark._

  test("ORC sink/source round trip preserves rows and schema") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("orc_rt")
    docs.write.mode("overwrite").orc(s"$dir/docs")
    val back = spark.read.orc(s"$dir/docs")
    assert(back.schema === docs.schema)
    assert(back.orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("CSV sink/source round trip with explicit schema (S6 surface)") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val dir = java.nio.file.Files.createTempDirectory("csv_rt")
    li.write.mode("overwrite").option("header", "true").csv(s"$dir/li")
    val back = spark.read.schema(li.schema)
      .option("header", "true").csv(s"$dir/li")
    assert(back.orderBy("l_orderkey", "l_linenumber").collect().toSeq ===
      li.orderBy("l_orderkey", "l_linenumber").collect().toSeq)
  }

  test("partitioned parquet append is additive (R3/S7 semantics)") {
    val docs = Tables.documents(spark, sf)
      .withColumn("part", (col("doc_id") % 3).cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("pq_append")
    docs.filter(col("part") === 0)
      .write.partitionBy("part").mode("append").parquet(s"$dir/t")
    docs.filter(col("part") =!= 0)
      .write.partitionBy("part").mode("append").parquet(s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() === docs.count())
    // partition pruning reads only one directory
    val pruned = back.filter(col("part") === 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(part"), scan)
    assert(pruned.count() === docs.filter(col("part") === 1).count())
  }

  test("schema evolution: a column added in later partitions merges on read") {
    val dir = java.nio.file.Files.createTempDirectory("evolve")
    val docs = Tables.documents(spark, sf)
    // day 1: original schema; day 2: pipeline starts writing a new
    // quality-score column (the additive-evolution case a long-lived
    // warehouse must absorb without rewriting history)
    docs.filter(col("doc_id") % 2 === 0)
      .write.parquet(s"$dir/t/day=1")
    docs.filter(col("doc_id") % 2 === 1)
      .withColumn("quality", length(col("text")).cast("double"))
      .write.parquet(s"$dir/t/day=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.contains("quality"))
    assert(merged.count() === docs.count())
    // old rows surface the new column as null; new rows carry it
    assert(merged.filter(col("day") === 1 && col("quality").isNotNull)
      .count() === 0)
    assert(merged.filter(col("day") === 2 && col("quality").isNull)
      .count() === 0)
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dpp")
    // date-partitioned fact (the warehouse layout at scale)
    Tables.lineitem(spark, sf)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .write.partitionBy("ship_month").mode("overwrite").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    val months = fact.select("ship_month").distinct()
      .as[String].collect().sorted
    // independent dim carrying the selective predicate — the partition
    // filter on the fact is only knowable at RUNTIME from the dim
    // rows. Parquet-backed on purpose: a local relation would be
    // constant-folded at optimization time, erasing the Filter node
    // the PartitionPruning rule looks for.
    months.zipWithIndex
      .map { case (m, i) => (m, if (i < 2) "target" else "other") }
      .toSeq.toDF("ship_month", "tag")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val joined = fact.join(dim, "ship_month")
      .where(col("tag") === "target")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery on the fact scan:\n$plan")
    val expected = fact.filter(col("ship_month").isin(months.take(2): _*)).count()
    assert(joined.count() === expected)
  }
}
