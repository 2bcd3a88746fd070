package graft

import org.apache.hadoop.fs.{FileSystem, Path}

/** Best-effort cross-JVM writer lease over the Hadoop FileSystem
  * API, for the two warehouse structures whose read-modify-write
  * cycles assume a single writer: the IVF index root (manifest +
  * version-dir GC) and warehouse compaction/ingest (manifest append,
  * directory swap). Two drivers pointed at one warehouse root is an
  * ordinary misconfiguration; without a lease they interleave
  * silently — each writes a manifest missing the other's entry, and
  * GC deletes the other's live data (VERDICT r7 item 4). The lease
  * turns that into a LOUD failure.
  *
  * Mechanism: `fs.create(lockFile, overwrite = false)` — atomic
  * create-if-absent on HDFS and the local filesystem (s3a provides
  * conditional create on recent Hadoop; older object stores make
  * this best-effort, which is still strictly better than the
  * honor-system it replaces). The file body records pid@host and a
  * wall-clock stamp for diagnostics. A lease older than
  * [[StaleAfterMs]] is presumed abandoned by a crashed writer and is
  * taken over (delete + one retry) — crash recovery therefore waits
  * at most the stale window, and the takeover race between two
  * waiting writers resolves at the atomic re-create. */
object FsLease {

  /** How old a lease file must be before a new writer may presume
    * its holder crashed. 10 minutes: far above any manifest write,
    * far below an operator's patience. */
  val StaleAfterMs: Long = 10 * 60 * 1000L

  /** Run `body` holding an exclusive lease file `name` under `dir`.
    * Throws [[IllegalStateException]] (naming the current holder) if
    * a fresh lease is already present. The lease is always released
    * on exit, including on exception. */
  def withLease[T](fs: FileSystem, dir: Path, name: String,
                   staleAfterMs: Long = StaleAfterMs)(body: => T): T = {
    val lock = new Path(dir, name)
    acquire(fs, lock, staleAfterMs, retry = true)
    try body
    finally {
      try fs.delete(lock, false)
      catch { case _: java.io.IOException => () } // release is best-effort
    }
  }

  private def holderTag: String = {
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean.getName // pid@host
    s"$rt ${System.currentTimeMillis()}"
  }

  private def acquire(fs: FileSystem, lock: Path, staleAfterMs: Long, retry: Boolean): Unit = {
    val created =
      try {
        val out = fs.create(lock, false) // atomic create-if-absent
        try out.write((holderTag + "\n").getBytes("UTF-8")) finally out.close()
        true
      } catch {
        // local FS raises plain IOException, HDFS FileAlreadyExistsException
        case _: java.io.IOException if fs.exists(lock) => false
      }
    if (!created) {
      val st = fs.getFileStatus(lock)
      val age = System.currentTimeMillis() - st.getModificationTime
      if (age > staleAfterMs && retry) {
        // presumed-crashed holder: take over. Concurrent takeovers
        // race to the atomic re-create; the loser fails loudly below.
        fs.delete(lock, false)
        acquire(fs, lock, staleAfterMs, retry = false)
      } else {
        val holder =
          try {
            val in = fs.open(lock)
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
          } catch { case _: java.io.IOException => "<unreadable>" }
        throw new IllegalStateException(
          s"concurrent writer holds $lock (holder: $holder, age ${age / 1000}s): " +
            "another process is building/compacting against this root. Retry after it " +
            s"finishes, or delete the lock if its holder crashed <${staleAfterMs / 1000}s ago.")
      }
    }
  }
}
