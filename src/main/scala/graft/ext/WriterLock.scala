package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Single-writer ENFORCEMENT for the persisted index maintenance paths
  * (r14 verdict ask #4). The append/compact contract was previously
  * documented but not enforced ([[IndexMaintenance]] scaladoc): a second
  * concurrent writer — say, two streams started on the same workDir, or
  * an ad-hoc append racing a stream's maintenance window — would
  * silently lose files (a concurrent append's files vanish with the
  * directory `compactIndex` swaps out). This sentinel makes the loser
  * FAIL LOUDLY instead.
  *
  * Mechanism: an atomic create-if-absent lock file (`fs.create(path,
  * overwrite = false)` — the primitive HDFS/local/object-store FS
  * contracts make atomic) held only for the DURATION of one mutation and
  * deleted in `finally`. The sentinel lives as a SIBLING of the guarded
  * directory, never inside it, because `compactIndex` renames the
  * directory itself during the swap.
  *
  * Reentrant per thread: the fused streaming folds append under the
  * same-thread maintenance window that then compacts; a thread that
  * already holds a lock re-enters without touching the FS.
  *
  * Crash story: a JVM that dies MID-MUTATION leaves the sentinel behind
  * (exactly when it may also leave a half-appended file set or an
  * interrupted swap). The sentinel records (host, pid); on conflict the
  * next writer auto-recovers the ONE case it can decide soundly — the
  * holder ran on THIS host and its pid is provably dead
  * (`ProcessHandle.of(pid)` empty): the common unattended-restart
  * story, a stream whose own previous incarnation crashed. Takeover is
  * race-safe via atomic rename (two healers both finding the same dead
  * holder race the rename of THAT sentinel; exactly one wins, the loser
  * re-enters the normal conflict path against the winner's fresh lock).
  * Every other case — holder alive, foreign host, unreadable info —
  * fails loudly with the holder's identity and the manual remediation
  * ([[breakLock]] after confirming death;
  * [[IndexMaintenance.recoverInterruptedSwap]] heals swap residue at
  * the next open either way). Deliberately NOT lease/TTL-expiring: a
  * timeout shorter than the slowest real compaction would steal a LIVE
  * writer's lock, which is the corruption this exists to prevent —
  * dead-pid-on-this-host is a proof of death, a timeout is a guess.
  *
  * The catalog needs no sentinel: [[graft.operators.Catalog]] commits
  * through a version-directory rename CAS (writeVersion's `v_NNNNNN`
  * publish), so of two interleaved committers exactly one rename wins
  * and the loser already throws before any of its bytes become visible —
  * CatalogSpec's concurrent-committer test pins that. The ext/ indexes
  * have no version manifest (plain parquet layout, by design — probes
  * are partition-pruned directory reads), hence the sentinel.
  */
object WriterLock {

  /** A second writer hit a held lock — the loud loser of ask #4. */
  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)

  /** Sentinel path for a guarded directory: a dot-prefixed SIBLING
    * (invisible to parquet partition discovery, stable across the
    * compaction swap's renames of the directory itself).
    */
  def lockPath(root: Path): Path =
    new Path(root.getParent, s"._graft_writer_lock_${root.getName}")

  // Locks this thread currently holds (qualified sentinel paths) — the
  // reentrancy set for fold→append→compact chains on one thread.
  private val held = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** Run `body` as the single writer of `dir`: acquire the sentinel (or
    * throw [[ConcurrentWriterException]] if another writer holds it),
    * release on every exit path. Reentrant within the owning thread.
    */
  def withLock[T](spark: SparkSession, dir: String, op: String)
                 (body: => T): T = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = lockPath(root)
    val key = fs.makeQualified(lock).toString
    if (held.get().contains(key)) return body
    acquire(fs, lock, op, dir)
    held.set(held.get() + key)
    try body
    finally {
      held.set(held.get() - key)
      fs.delete(lock, false)
    }
  }

  private def localHost: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: java.net.UnknownHostException => "unknown-host" }

  private def acquire(fs: FileSystem, lock: Path, op: String,
                      dir: String): Unit = {
    val info =
      s"op=$op host=$localHost pid=${ProcessHandle.current().pid()} " +
        s"thread=${Thread.currentThread().getName} " +
        s"acquired_ms=${System.currentTimeMillis()}"
    def tryCreate(): Option[org.apache.hadoop.fs.FSDataOutputStream] =
      try Some(fs.create(lock, false)) // atomic create-if-absent: the CAS
      catch { case _: java.io.IOException => None }
    val out = tryCreate().orElse {
      // one stale-takeover attempt, then one re-create attempt — never
      // a loop (a live contender winning the re-create must lose us)
      if (takeOverIfProvablyDead(fs, lock)) tryCreate() else None
    }.getOrElse {
      val holder =
        try {
          val in = fs.open(lock)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        } catch { case _: java.io.IOException => "(holder unreadable)" }
      throw new ConcurrentWriterException(
        s"$op on $dir: another writer holds the lock [$holder]. " +
          "Index maintenance is single-writer; if that holder " +
          "crashed, remove the sentinel with WriterLock.breakLock " +
          "and re-run (IndexMaintenance.recoverInterruptedSwap heals " +
          "any swap residue it left).")
    }
    try out.write(info.getBytes("UTF-8")) finally out.close()
  }

  private val HostPidRe = """.*\bhost=(\S+)\s.*\bpid=(\d+)\b.*""".r

  /** Sound-and-safe stale-lock recovery: true iff the sentinel named a
    * holder on THIS host whose pid no longer exists, and WE won the
    * atomic rename of that exact sentinel (the loser of a takeover race
    * sees rename fail and falls back to the loud conflict path).
    * Everything undecidable from here — foreign host, live pid,
    * unreadable/unparseable info — is false: manual remediation only.
    */
  private def takeOverIfProvablyDead(fs: FileSystem, lock: Path): Boolean = {
    val holderInfo =
      try {
        val in = fs.open(lock)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      } catch { case _: java.io.IOException => return false }
    holderInfo match {
      case HostPidRe(host, pidStr) if host == localHost =>
        val dead =
          try ProcessHandle.of(pidStr.toLong)
            .map[Boolean](p => !p.isAlive).orElse(true)
          catch { case _: NumberFormatException => false }
        if (!dead) return false
        val tomb = new Path(lock.getParent,
          s"${lock.getName}.stale_${ProcessHandle.current().pid()}_" +
            s"${System.nanoTime()}")
        val won =
          try fs.rename(lock, tomb)
          catch { case _: java.io.IOException => false }
        if (won) {
          fs.delete(tomb, false)
          graft.Instr.record("writerLock.stale_taken_over", 1.0)
        }
        won
      case _ => false
    }
  }

  /** Remove a stale sentinel left by a crashed writer. MANUAL
    * remediation by an operator who has confirmed the holder is dead —
    * breaking a LIVE writer's lock reintroduces the silent-loss race.
    * Returns whether a sentinel existed.
    */
  def breakLock(spark: SparkSession, dir: String): Boolean = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(lockPath(root), false)
  }

  /** Whether a writer currently holds `dir`'s sentinel. */
  def isLocked(spark: SparkSession, dir: String): Boolean = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(lockPath(root))
  }
}
