package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // match Bench's codegen-cache sizing so profiles are comparable
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4000"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same opt-in as Bench: point two successive Profile sessions at
    // one warehouse dir to measure cold-build vs snapshot-adopt
    sys.env.get("SPARK_GRAFT_SNAPSHOT_WAREHOUSE").filter(_.nonEmpty)
      .foreach(w => spark.conf.set("spark.graft.snapshotWarehouse", w))
    val names = args
    for (n <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      // noop sink like Bench: count() lets Catalyst skip computing
      // aggregate VALUES (it only needs group keys), timing a
      // different query than the one declared
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"PROF $n run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
