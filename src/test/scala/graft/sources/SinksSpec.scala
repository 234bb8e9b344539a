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
}
