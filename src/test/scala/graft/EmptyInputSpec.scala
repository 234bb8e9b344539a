package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Empty-corpus robustness: at production scale pipelines constantly
  * meet empty dates, empty partitions, and filters that match nothing.
  * Every testdata-driven query must plan and execute over a 0-row
  * corpus (correct schemas, no data) without throwing — an operator
  * that crashes on empty input is a paged on-call engineer.
  */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emptyDir: String = {
    val d = java.nio.file.Files.createTempDirectory("sf_empty")
    // raw schemas (events keeps whatever ts storage the fixture uses;
    // the loader's dtype-branching normalization runs on read as usual)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (t <- Tables.names)
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.parquet(s"$d/$t.parquet")
    d.toString
  }

  test("every testdata query executes over a 0-row corpus") {
    // boatrace_* read the reference corpus and ignore the sf dir
    val skip = Set("boatrace")
    val failures = SparkEntry.defs
      .filterNot(q => skip.exists(q.name.startsWith))
      .flatMap { q =>
        val r = try { q.run(spark, emptyDir).count(); None }
        catch { case e: Throwable => Some(q.name -> e.toString.take(200)) }
        PersistRegistry.release()
        r
      }
    assert(failures.isEmpty,
      failures.map { case (n, e) => s"$n: $e" }.mkString("\n"))
  }
}
