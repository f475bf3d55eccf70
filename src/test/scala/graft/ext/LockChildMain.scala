package graft.ext

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Entry point for [[CrossProcessLockSpec]]'s REAL second JVM. Every
  * other hardening spec (including the takeover fuzz) is intra-JVM —
  * threads racing synthesized sentinels — but tier-1's
  * `ProcessHandle.of(pid)` death proof, the boot-id match, and the
  * O_EXCL create are cross-PROCESS claims a thread can't pin. This
  * main is the other process: it speaks the real protocol (the same
  * `WriterLock.withLock` the streams call) and gets `kill -9`'d by
  * the parent spec mid-hold.
  *
  * Modes (args(0)):
  *  - `hold <dir> <beatMs> <staleBeats>`: acquire the lock on `dir`,
  *    print the HELD marker, heartbeat until killed (never releases —
  *    SIGKILL runs no hooks, which is the point).
  *  - `race <fsProbePath> <goPrefix> <contestedPrefix> <rounds>`: for
  *    each round, spin until the parent drops the go file, then race
  *    the parent's own `createExclusive` on the contested path; print
  *    WIN/LOSE per round.
  *  - `wedge <dir> <releaseGoPath> <beatMs> <staleBeats>`: acquire,
  *    print HELD, then poll for the release-go file. The parent
  *    `kill -STOP`s this process mid-hold (alive pid, beats frozen —
  *    the tier-2 wedged-holder shape), takes over through the lease
  *    tier, `kill -CONT`s it, and drops the go file; the resumed
  *    zombie's release must LOSE loudly (sentinel now the usurper's →
  *    ReleaseSkipped), which this main reports in its RELEASED marker.
  *
  * Markers go to stdout prefixed `CHILD_` so the parent can pick them
  * out of any logging noise on the merged stream.
  */
object LockChildMain {

  def main(args: Array[String]): Unit = args(0) match {
    case "hold" =>
      val dir = args(1)
      WriterLock.withLock(new Configuration(), dir, "child-hold",
        WriterLock.Lease(beatMs = args(2).toLong,
          staleBeats = args(3).toInt)) {
        println(s"CHILD_HELD pid=${ProcessHandle.current().pid()}")
        System.out.flush()
        Thread.sleep(10L * 60 * 1000) // until killed (spec-bounded)
      }

    case "wedge" =>
      val dir = args(1)
      val releaseGo = new java.io.File(args(2))
      WriterLock.withLock(new Configuration(), dir, "child-wedge",
        WriterLock.Lease(beatMs = args(3).toLong,
          staleBeats = args(4).toInt)) {
        println(s"CHILD_HELD pid=${ProcessHandle.current().pid()}")
        System.out.flush()
        val deadline = System.nanoTime() + 10L * 60 * 1000000000L
        while (!releaseGo.exists() && System.nanoTime() < deadline)
          Thread.sleep(20)
      }
      // the body returned → withLock's finally ran the release path;
      // report what it did (a usurped release records ReleaseSkipped)
      println("CHILD_RELEASED skipped=" + MaintenanceEvents.count(dir,
        MaintenanceEvents.ReleaseSkipped))
      System.out.flush()

    case "race" =>
      val fs = new Path(args(1)).getFileSystem(new Configuration())
      val goPrefix = args(2)
      val contestedPrefix = args(3)
      val rounds = args(4).toInt
      println("CHILD_READY")
      System.out.flush()
      for (r <- 1 to rounds) {
        val go = new java.io.File(s"${goPrefix}_$r")
        val deadline = System.nanoTime() + 60L * 1000000000L
        // tight spin (no sleep): both sides must see the go file within
        // microseconds of each other for the create race to be real
        while (!go.exists() && System.nanoTime() < deadline)
          Thread.onSpinWait()
        val won = WriterLock.createExclusive(fs,
          new Path(s"${contestedPrefix}_$r"),
          s"child_round_$r".getBytes("UTF-8"))
        println(s"CHILD_RACE $r ${if (won) "WIN" else "LOSE"}")
        System.out.flush()
      }
      println("CHILD_DONE")
      System.out.flush()
  }
}
