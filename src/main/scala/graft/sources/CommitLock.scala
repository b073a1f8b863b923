package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Advisory exclusive lock over a filesystem path — the multi-writer
  * mutual-exclusion primitive [[graft.sinks.IdempotentFileSink]],
  * [[IncrementalLedger]] and [[FileManifest]] commit through. Built on
  * the one atomic filesystem verb every Hadoop FileSystem guarantees:
  * `create(path, overwrite = false)` either creates the file or throws
  * because it already exists — two racing writers cannot both succeed.
  * (HDFS and local FS honor this atomically; object stores without
  * atomic create — bare S3 — need their own coordination layer, the
  * same caveat Delta's LogStore documents.)
  *
  * Crash safety: a writer that dies holding the lock leaves the file
  * behind. Waiters treat a lock older than `staleMs` (by filesystem
  * modification time) as abandoned, break it, and re-race — so a
  * crashed writer delays rivals by at most the staleness window instead
  * of deadlocking the root forever. `staleMs` must exceed the longest
  * legitimate critical section; commit sections here are
  * metadata-sized (rename + small writes), not data jobs, except the
  * ledger's whole-run lock, whose callers size `staleMs` to their run
  * budget.
  */
private[graft] object CommitLock {

  /** In-process tier: `create(path, overwrite=false)` is atomic on HDFS
    * but CHECK-THEN-ACT on the local filesystem (RawLocalFileSystem
    * probes exists() before creating), so two threads of one JVM could
    * both "win" it. A per-path JVM mutex closes that window exactly;
    * the lock FILE remains the cross-process tier, with HDFS-grade
    * atomicity where the filesystem provides it.
    */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()

  /** Run `body` holding the exclusive lock at `path`: first the JVM
    * per-path mutex (same-process writers), then the lock file (rival
    * processes), both bounded by `waitMs` (50 ms polls). Breaks lock
    * files staler than `staleMs`; throws `java.io.IOException` on
    * timeout.
    */
  def withLock[T](fs: FileSystem, path: Path,
      waitMs: Long = 60000L, staleMs: Long = 600000L)(body: => T): T = {
    val jl = jvmLocks.computeIfAbsent(path.toString,
      _ => new java.util.concurrent.locks.ReentrantLock())
    if (!jl.tryLock(waitMs, java.util.concurrent.TimeUnit.MILLISECONDS))
      throw new java.io.IOException(
        s"timed out after ${waitMs}ms waiting for in-process commit lock $path")
    try {
      val deadline = System.currentTimeMillis() + waitMs
      var acquired = false
      while (!acquired) {
        try {
          val out = fs.create(path, false)
          out.close()
          acquired = true
        } catch {
          case _: java.io.IOException =>
            // held by a rival process (or just broken): stale-break, wait
            try {
              val st = fs.getFileStatus(path)
              if (System.currentTimeMillis() - st.getModificationTime > staleMs)
                fs.delete(path, false) // abandoned by a crashed writer
            } catch { case _: java.io.FileNotFoundException => () }
            if (System.currentTimeMillis() > deadline)
              throw new java.io.IOException(
                s"timed out after ${waitMs}ms waiting for commit lock $path")
            Thread.sleep(50)
        }
      }
      try body
      finally fs.delete(path, false)
    } finally jl.unlock()
  }
}
