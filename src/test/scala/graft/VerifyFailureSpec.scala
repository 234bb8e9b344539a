package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-8 Verify contract: a query that fails to EXECUTE
  * must leave an explicit red row in the correctness gate, never a
  * silent gap. (Round 7 omitted 19 failing queries from the artifact
  * with no failure record — the run read as clean while ~15% of the
  * suite went unverified.)
  */
class VerifyFailureSpec extends AnyFunSuite {
  import TestSpark._

  test("a failing query leaves a marker frame and a verify_errors entry") {
    val out = java.nio.file.Files.createTempDirectory("vfail").toString
    // a nonexistent corpus dir makes every query throw at plan time;
    // the subset arg skips the boatrace base dump (whose absence is a
    // separate, already-fail-fast path)
    Verify.main(Array("/tmp/graft_no_such_corpus", out, "q01_scan_project"))

    // the failed query's output slot holds the marker frame — the
    // driver's compare turns it into a schema-mismatch row carrying
    // the error text
    val marker = spark.read.parquet(s"$out/q01_scan_project")
    assert(marker.columns.toSeq ===
      Seq("__verify_execution_failed__", "error"))
    val row = marker.collect().head
    assert(row.getString(0) === "execution_failed")
    assert(row.getString(1).contains("PATH_NOT_FOUND"))

    // and the machine-readable error index names it
    val errs = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/verify_errors.json")), "UTF-8")
    assert(errs.contains("\"q01_scan_project\""))
  }
}
