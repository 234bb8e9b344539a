package graft

import org.apache.spark.sql.SparkSession

/** Plan-attribution diagnostic: execute ONE query against one or more
  * data dirs and print the FINAL (post-AQE) physical plan plus the
  * run's shuffle-write bytes for each — the tool for naming the cause
  * of a scale-curve step (round-15 verdict: d18's per-copy shuffle
  * took one unexplained 2× step between the 25× and 50× corpora;
  * "bounded regime step" is an observation, the PLAN DIFF is the
  * attribution). AQE re-plans at runtime, so only an EXECUTED plan —
  * `isFinalPlan=true` — is evidence; explain() before an action shows
  * the static guess.
  *
  * Usage: runMain graft.PlanDump <query> <dir> [dir...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <query> <dir> [dir...]")
    val (name, dirs) = (args.head, args.tail.toSeq)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.debug.maxToStringFields", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    for (dir <- dirs) {
      val df = SparkEntry.queries(name)(spark, dir)
      val s0 = shuffleBytes.get()
      // execute df's OWN QueryExecution: df.count()/noop-write build a
      // DERIVED execution, leaving df.queryExecution.executedPlan the
      // static pre-AQE guess (isFinalPlan=false) — the exact
      // non-evidence this tool must never print (review-caught,
      // verified against the shipped runtime). toRdd is the executed
      // plan's RDD, so counting it finalizes adaptive re-planning in
      // THIS QueryExecution without materializing rows on the driver.
      val nRows = df.queryExecution.toRdd.count()
      Thread.sleep(1000) // listener events lag job completion
      val shMb = (shuffleBytes.get() - s0) / 1e6
      PersistRegistry.release()
      println(s"==== PLANDUMP $name @ $dir rows=$nRows " +
        f"shuffleMB=$shMb%.2f ====")
      val plan = df.queryExecution.executedPlan.toString
      require(!plan.contains("isFinalPlan=false"),
        "executed plan still carries isFinalPlan=false — the dump " +
        "would be the static guess, not evidence")
      println(plan)
      println(s"==== END $name @ $dir ====")
    }
    spark.stop()
  }
}
