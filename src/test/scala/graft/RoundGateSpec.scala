package graft

import java.nio.file.{Files, Path}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Pins tools/round_gate.py's evidence-consistency contract (round 13,
  * verdict 2: two straight rounds committed COVERAGE.md prose numbers
  * contradicting the committed bench_detail.json — the gate must now
  * refuse such a snapshot). Runs the real script against fixture
  * repos via ROUND_GATE_REPO.
  */
class RoundGateSpec extends AnyFunSuite {

  private val gate = "/root/repo/tools/round_gate.py"

  private def repo(benchDetail: String, coverage: String,
      scale: Option[String] = None): Path = {
    val dir = Files.createTempDirectory("graft-gate-")
    Files.writeString(dir.resolve("bench_detail.json"), benchDetail)
    Files.writeString(dir.resolve("COVERAGE.md"), coverage)
    scale.foreach(s => Files.writeString(dir.resolve("SCALE_r13.json"), s))
    dir
  }

  private def run(dir: Path): (Int, String) = {
    val out = new StringBuilder
    val rc = Process(Seq("python3", gate),
      cwd = None, "ROUND_GATE_REPO" -> dir.toString)
      .!(ProcessLogger(l => out.append(l).append('\n')))
    (rc, out.toString)
  }

  private val greenBench =
    """{"total_sec": 100.5, "n_queries": 169, "errors": [],
      |"regressions": [], "unused_accept_names": [],
      |"suite_drift": {"ratio": 1.01, "tripped": false}}""".stripMargin

  test("gate is green when COVERAGE.md marker and prose match the " +
      "committed bench_detail") {
    val cov = """# COVERAGE
      |<!-- bench: total_sec=100.5 n_queries=169 drift_ratio=1.01 -->
      |The committed bench is green: suite total 100.5 s.
      |""".stripMargin
    val (rc, out) = run(repo(greenBench, cov))
    assert(rc === 0, out)
    assert(out.contains("COVERAGE.md claims consistent"), out)
  }

  test("gate is red when prose claims a suite total the artifact " +
      "contradicts (the round-11/12 failure mode)") {
    val cov = """# COVERAGE
      |<!-- bench: total_sec=100.5 n_queries=169 drift_ratio=1.01 -->
      |Earlier intra-round run: suite total 89.7 s at 0.97x.
      |""".stripMargin
    val (rc, out) = run(repo(greenBench, cov))
    assert(rc === 1, out)
    assert(out.contains("suite total 89.7"), out)
  }

  test("gate is red when the marker is missing or contradicts the " +
      "artifact") {
    val (rc1, out1) = run(repo(greenBench, "# COVERAGE\nno marker\n"))
    assert(rc1 === 1, out1)
    assert(out1.contains("lacks the bench marker"), out1)
    val covBad = """<!-- bench: total_sec=89.7 n_queries=169 drift_ratio=1.01 -->
      |""".stripMargin
    val (rc2, out2) = run(repo(greenBench, covBad))
    assert(rc2 === 1, out2)
    assert(out2.contains("total_sec=89.7"), out2)
  }

  test("round OPEN: a pending driver re-stamp (working-tree bench " +
      "disagrees, marker matches the COMMITTED artifact) is green " +
      "with a note") {
    // reproduce round-14's open state: HEAD holds the bench the
    // marker cites; the driver's post-snapshot rerun overwrote the
    // working tree with a slightly different total
    val cov = """<!-- bench: total_sec=100.5 n_queries=169 drift_ratio=1.01 -->
      |""".stripMargin
    val dir = repo(greenBench, cov)
    def git(args: String*): Unit =
      assert(Process("git" +: args.toSeq, dir.toFile).!(
        ProcessLogger(_ => ())) === 0)
    git("init", "-q")
    git("add", "-A")
    git("-c", "user.email=t@t", "-c", "user.name=t", "commit", "-q",
      "-m", "snapshot")
    Files.writeString(dir.resolve("bench_detail.json"),
      greenBench.replace("100.5", "99.8"))
    val (rc, out) = run(dir)
    assert(rc === 0, out)
    assert(out.contains("re-stamp is pending"), out)
  }

  test("round CLOSE: a committed bench the marker contradicts stays " +
      "red — the HEAD fallback cannot launder a stale marker") {
    val cov = """<!-- bench: total_sec=89.7 n_queries=169 drift_ratio=1.01 -->
      |""".stripMargin
    val dir = repo(greenBench, cov)
    def git(args: String*): Unit =
      assert(Process("git" +: args.toSeq, dir.toFile).!(
        ProcessLogger(_ => ())) === 0)
    git("init", "-q")
    git("add", "-A")
    git("-c", "user.email=t@t", "-c", "user.name=t", "commit", "-q",
      "-m", "snapshot")
    // HEAD and working tree agree (both 100.5); the marker cites 89.7
    val (rc, out) = run(dir)
    assert(rc === 1, out)
    assert(out.contains("total_sec=89.7"), out)
  }

  test("gate dedupes stale SCALE rows keeping the last and says so") {
    val cov = """<!-- bench: total_sec=100.5 n_queries=169 drift_ratio=1.01 -->
      |""".stripMargin
    val scale =
      """{"query": "d08", "factor": 25, "shuffle_mb": 9.9}
        |{"query": "d08", "factor": 25, "shuffle_mb": 11.9}
        |""".stripMargin
    val (rc, out) = run(repo(greenBench, cov, Some(scale)))
    assert(rc === 0, out)
    assert(out.contains("1 stale duplicate"), out)
  }
}
