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
  * interrupted swap). The next writer fails loudly with the holder's
  * identity and the remediation — confirm the holder is dead, run
  * [[breakLock]], then let [[IndexMaintenance.recoverInterruptedSwap]]
  * heal any swap residue. Deliberately NOT auto-expiring: a lease
  * timeout shorter than the slowest real compaction would steal a live
  * writer's lock, which is the corruption this exists to prevent.
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

  private def acquire(fs: FileSystem, lock: Path, op: String,
                      dir: String): Unit = {
    val info =
      s"op=$op pid=${ProcessHandle.current().pid()} " +
        s"thread=${Thread.currentThread().getName} " +
        s"acquired_ms=${System.currentTimeMillis()}"
    val out =
      try fs.create(lock, false) // atomic create-if-absent: the CAS
      catch {
        case _: java.io.IOException =>
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
