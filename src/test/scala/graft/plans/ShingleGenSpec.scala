package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class ShingleGenSpec extends AnyFunSuite {
  import TestSpark._

  test("shingles_gen via LATERAL VIEW equals the split+explode composition") {
    ShingleGen.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_sg")
    val viaGen = spark.sql(
      """SELECT doc_id, pos, shingle
        |FROM docs_sg LATERAL VIEW shingles_gen(text, 3) t AS pos, shingle
        |ORDER BY doc_id, pos""".stripMargin).collect()

    val w = split(trim(col("text")), "\\s+")
    val viaExplode = Tables.documents(spark, sf)
      .filter(size(w) >= 3)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(w) - 3),
          i => concat_ws(" ", slice(w, i + 1, lit(3))))))
      .toDF("doc_id", "pos", "shingle")
      .orderBy("doc_id", "pos").collect()
    assert(viaGen.toSeq === viaExplode.toSeq)
    assert(viaGen.nonEmpty)
  }

  test("the generator plans as a single Generate node") {
    ShingleGen.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_sg2")
    val df = spark.sql(
      "SELECT doc_id, shingle FROM docs_sg2 " +
        "LATERAL VIEW shingles_gen(text, 2) t AS pos, shingle")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate shinglegen"), s"plan:\n$plan")
    df.collect()
  }

  test("short and null texts generate nothing (no crash, no row)") {
    import spark.implicits._
    ShingleGen.register(spark)
    Seq((1L, "one two"), (2L, null.asInstanceOf[String]), (3L, "a b c"))
      .toDF("id", "t").createOrReplaceTempView("tiny_sg")
    val rows = spark.sql(
      "SELECT id, shingle FROM tiny_sg " +
        "LATERAL VIEW shingles_gen(t, 3) g AS pos, shingle").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(3L))
    assert(rows.head.getString(1) === "a b c")
  }
}
