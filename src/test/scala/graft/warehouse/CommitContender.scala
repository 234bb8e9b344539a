package graft.warehouse

/** Child-JVM driver for the CROSS-PROCESS commit-contention spec
  * (Round16Spec): round 15's single-writer-collision, orphan-reclaim
  * and stalled-committer specs all ran in ONE process, but the
  * deployment shape is two JVMs contending on one table — CREATE_NEW
  * claims and CURRENT publishes must serialize across real process
  * boundaries, not just across threads sharing a JVM's file-handle
  * state. The protocol under test is pure control-plane (no Spark):
  * this main loops raw commits with synthetic file lists, exactly the
  * claim/read-back/publish sequence every real commit runs.
  *
  * Modes:
  *  - `contend <dir> <writerId> <n>`: n base-independent commits
  *    (retryOnCollision = true), meta `w<writerId>:<i>` — the spec
  *    asserts every one landed exactly once across both processes.
  *  - `orphan <dir>`: claim the next version's manifest and EXIT
  *    without publishing — a real crashed commit (process death, not
  *    a simulated file drop), for the cross-process reclaim spec.
  */
object CommitContender {
  def main(args: Array[String]): Unit = args(0) match {
    case "contend" =>
      val (dir, writerId, n) = (args(1), args(2), args(3).toInt)
      val paceMs = if (args.length > 4) args(4).toLong else 0L
      for (i <- 0 until n) {
        SnapshotTable.commit(dir,
          Seq(s"data/$writerId-$i-${java.util.UUID.randomUUID()}"),
          Some(s"w$writerId:$i"), retryOnCollision = true)
        if (paceMs > 0) Thread.sleep(paceMs)
      }
    case "orphan" =>
      val dir = args(1)
      val v = SnapshotTable.currentVersionOf(dir).map(_ + 1).getOrElse(0)
      val claimed = CommitBackends.forDir(dir).putIfAbsent(
        s"$dir/_versions/" + f"v$v%05d.manifest",
        s"crashed-${java.util.UUID.randomUUID()}".getBytes("UTF-8"))
      // exit mid-commit: manifest claimed, CURRENT never published
      sys.exit(if (claimed) 0 else 1)
    case other =>
      sys.error(s"unknown mode $other")
  }
}
