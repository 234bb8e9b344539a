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

  test("a failing query leaves a marker frame, a verify_errors entry, " +
      "and a nonzero exit code") {
    val out = java.nio.file.Files.createTempDirectory("vfail").toString
    // a nonexistent corpus dir makes every query throw at plan time;
    // the subset arg skips the boatrace base dump (whose absence is a
    // separate, already-fail-fast path)
    val rc = Verify.run(Array("/tmp/graft_no_such_corpus", out,
      "q01_scan_project"))

    // rc-keying callers must see the failure without opening artifacts
    // (main wraps run's rc in sys.exit — asserting here pins the
    // process contract without killing the test JVM)
    assert(rc === 1)

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

  test("a queries-only run that succeeds exits 0") {
    val out = java.nio.file.Files.createTempDirectory("vok").toString
    val rc = Verify.run(Array(TestSpark.sf, out, "q25_schema_introspection"))
    assert(rc === 0)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/DUMP_FAILED")))
  }

  test("a base-dump failure writes DUMP_FAILED and aborts with rc 1 " +
      "before any query runs") {
    val out = java.nio.file.Files.createTempDirectory("vdump").toString
    // a plain FILE squatting on the dump directory makes the parquet
    // writer's mkdirs fail — the injected dump failure
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/boatrace_base"), "not a directory")
    val rc = Verify.run(Array(TestSpark.sf, out))
    assert(rc === 1)
    val msg = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/DUMP_FAILED")), "UTF-8")
    assert(msg.contains("boatrace base dump failed"))
    // the abort is BEFORE the query loop: no per-query output and no
    // oracle_sql.json — one self-explanatory failure, not 150 cryptic
    // downstream ones
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/oracle_sql.json")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/q01_scan_project")))
  }
}
