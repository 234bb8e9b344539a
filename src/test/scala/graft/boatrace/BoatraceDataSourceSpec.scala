package graft.boatrace

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The DSv2 `boatrace` format must agree row-for-row with the flatMap
  * pipeline, from both TXT and LZH sources, and push column pruning
  * into the reader. */
class BoatraceDataSourceSpec extends AnyFunSuite {
  import TestSpark.spark

  test("format(boatrace) over TXT equals the pipeline tables") {
    // parse once, derive all four expected tables from the shared
    // persisted dataset
    val parsed = BoatracePipeline.parseDir(spark, "/root/reference/txt")
    try {
      val expected = Map(
        "result" -> BoatracePipeline.resultDf(spark, parsed),
        "env" -> BoatracePipeline.envDf(spark, parsed),
        "odds" -> BoatracePipeline.oddsDf(spark, parsed),
        "schedule" -> BoatracePipeline.scheduleDf(spark, parsed))
      for ((t, df) <- expected) {
        val v2 = spark.read.format("boatrace").option("table", t)
          .load("/root/reference/txt").collect().map(_.toSeq).toSet
        assert(v2 === df.collect().map(_.toSeq).toSet, s"table $t")
        assert(v2.nonEmpty)
      }
    } finally parsed.unpersist()
  }

  test("format(boatrace) decodes LZH archives transparently") {
    val tmp = java.nio.file.Files.createTempDirectory("lzh_ds")
    for (f <- Seq("K2020-08-01.lzh", "B2020-08-01.lzh"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"/root/reference/lzh/$f"), tmp.resolve(f))
    val v2 = spark.read.format("boatrace").option("table", "odds")
      .load(tmp.toString)
    assert(v2.count() > 0)
    // all rows carry the archive's date
    assert(v2.filter(v2("レースID").startsWith("2020-08-01")).count()
      === v2.count())
  }

  test("column pruning reaches the reader") {
    val df = spark.read.format("boatrace").option("table", "schedule")
      .load("/root/reference/txt")
      .select("レースID")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=レースID"), s"pruned scan not found in:\n$plan")
  }

  test("レースID prefix predicate prunes files at planning time") {
    val df = spark.read.format("boatrace").option("table", "result")
      .load("/root/reference/txt")
    val filtered = df.filter(df("レースID").startsWith("2020-08-28"))
    // only that date's K file (result rows come from K) should be read:
    // 2 of 62 files survive pruning (K+B of the date)
    assert(filtered.rdd.getNumPartitions === 2,
      s"expected 2 pruned partitions, got ${filtered.rdd.getNumPartitions}")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("prunedToDates=2020-08-28"), s"plan:\n$plan")
    // correctness: pruned result equals the unpruned filter
    val full = df.collect().filter(_.getString(0).startsWith("2020-08-28"))
    assert(filtered.count() === full.length)
    assert(filtered.count() > 0)
  }

  test("limit is pushed into the reader (per-partition row bound)") {
    val df = spark.read.format("boatrace").option("table", "result")
      .load("/root/reference/txt").limit(5)
    assert(df.count() === 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=5"), s"plan:\n$plan")
  }

  test("one input partition per file (scalable planning unit)") {
    val df = spark.read.format("boatrace").option("table", "result")
      .load("/root/reference/txt")
    assert(df.rdd.getNumPartitions === 62)
  }

  test("the oracle-gate date query runs through the DSv2 pruned scan") {
    // boatrace_date_query is a hash-checked CORRECTNESS row; this pins
    // that the row exercises the connector's planning-time file
    // pruning, not the flatMap pipeline path
    val df = graft.SparkEntry.queries("boatrace_date_query")(spark, "")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("prunedToDates=2020-08-28"), s"plan:\n$plan")
    assert(df.count() > 0)
  }

  test("reported statistics shrink with file pruning (broadcast eligibility)") {
    import org.apache.spark.sql.functions.col
    val all = spark.read.format("boatrace").option("table", "result")
      .load("/root/reference/txt")
    val pruned = all.filter(col("レースID").startsWith("2020-08-28"))
    val sAll = all.queryExecution.optimizedPlan.stats.sizeInBytes
    val sPruned = pruned.queryExecution.optimizedPlan.stats.sizeInBytes
    // SupportsReportStatistics reports POST-pruning bytes (2 of 62
    // files), so the planner can see a pruned side is broadcastable
    assert(sPruned * 10 < sAll, s"pruned=$sPruned all=$sAll")
  }
}
