package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew handling — the complement of q30's explicit salting:
  * AQE detects an oversized shuffle partition AFTER the map stage ran
  * (real sizes, not estimates) and splits it into parallel sub-reads.
  * Salting is the plan-time fix you apply when you KNOW the hot keys;
  * AQE skew-join is the safety net for the hot keys you didn't
  * predict — at 100 TB both matter and the engine demonstrates both.
  */
class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("AQE splits the skewed partition at runtime (skew=true in plan)") {
    val base = java.nio.file.Files.createTempDirectory("skew").toString
    import spark.implicits._
    // fact: 50k rows, 90% on one hot key — one shuffle partition dwarfs
    // the rest. parquet-backed so sizes are real.
    (1 to 50000).map(i => (if (i % 10 == 0) i.toLong % 97 else 7L, i.toLong))
      .toDF("k", "v").write.parquet(s"$base/fact")
    (0L to 96L).map(k => (k, s"dim$k")).toDF("k", "name")
      .write.parquet(s"$base/dim")
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the 50k-row corpus counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force a sort-merge join: broadcast would dodge the skew
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val orig = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.read.parquet(s"$base/fact")
        .join(spark.read.parquet(s"$base/dim"), "k")
      // execute THIS DataFrame (count() would plan a different query
      // and leave joined's adaptive plan unfinalized)
      assert(joined.collect().length === 50000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the join skewed; plan:\n${plan.take(2000)}")
    } finally orig.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
