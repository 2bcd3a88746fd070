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
  * Mechanism, per filesystem:
  *  - `file:` scheme — `java.nio.file.Files.createFile` (a true
  *    O_EXCL atomic create; Hadoop's RawLocalFileSystem
  *    `create(overwrite = false)` is a non-atomic exists-then-open,
  *    so two local JVMs could both pass it).
  *  - everything else — `fs.create(lock, overwrite = false)`, atomic
  *    on HDFS; object stores without conditional create degrade to
  *    best-effort, still strictly better than the honor system.
  *
  * The file body records pid@host + a stamp for diagnostics. While
  * the body runs, a daemon heartbeat re-touches the lease mtime
  * every [[StaleAfterMs]]/3, so a LIVE long-running holder (a
  * multi-hour index build) is never presumed dead; only a crashed
  * holder's lease goes stale and is taken over (re-verified status +
  * delete + one retry). The takeover race between two waiting
  * writers is further narrowed by a read-back: after creating, the
  * acquirer re-reads the lock and aborts loudly if the content is
  * not its own tag (a rival's delete+create slipped in between).
  * Residual windows exist (this is an advisory lease, not a
  * consensus protocol) — the goal is turning ordinary double-writer
  * misconfiguration from silent corruption into a loud error. */
object FsLease {

  /** How old a lease file must be before a new writer may presume
    * its holder crashed. The holder heartbeats at a third of this,
    * so staleness genuinely implies a dead (or wholly stalled)
    * process, not just a long build. */
  val StaleAfterMs: Long = 10 * 60 * 1000L

  /** Run `body` holding an exclusive lease file `name` under `dir`.
    * Throws [[IllegalStateException]] (naming the current holder) if
    * a fresh lease is already present. The lease is always released
    * (and its heartbeat stopped) on exit, including on exception. */
  def withLease[T](fs: FileSystem, dir: Path, name: String,
                   staleAfterMs: Long = StaleAfterMs)(body: => T): T = {
    val lock = new Path(dir, name)
    val tag = holderTag
    acquire(fs, lock, tag, staleAfterMs)
    val beat = startHeartbeat(fs, lock, staleAfterMs)
    try {
      val result = body
      beat.interrupt()
      release(fs, lock, tag)
      result
    } catch {
      case e: Throwable =>
        beat.interrupt()
        // release's lost-lease IllegalStateException must not MASK the
        // body's own failure — attach it as suppressed instead
        try release(fs, lock, tag)
        catch { case rel: Throwable => e.addSuppressed(rel) }
        throw e
    }
  }

  /** Best-effort release that only deletes a lock we still own. If
    * the heartbeat degraded persistently (object store whose setTimes
    * throws), our lease can go stale mid-body and a rival may have
    * legitimately taken over and written ITS tag — deleting
    * unconditionally here would destroy the rival's LIVE lease and
    * re-open the silent double-writer window. So: read the holder
    * first; on a foreign tag, leave the file and fail loudly (the
    * body already ran under a lost lease — the operator must check
    * the warehouse state). Unreadable content (transient read
    * failure, or lock already gone) falls through to the plain
    * best-effort delete, matching the pre-guard behavior. */
  private def release(fs: FileSystem, lock: Path, tag: String): Unit = {
    val holder = readHolder(fs, lock)
    if (holder.exists(_ != tag))
      throw new IllegalStateException(
        s"lease $lock was lost mid-run to ${holder.get} — this writer's heartbeat " +
          "must have degraded past the stale window and a rival took over; its lock " +
          "is left in place, but both writers may have touched the root: verify the " +
          "manifest before trusting this run's output")
    try fs.delete(lock, false)
    catch { case _: java.io.IOException => () } // release is best-effort
  }

  private def holderTag: String = {
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean.getName // pid@host
    s"$rt ${System.currentTimeMillis()} ${java.util.UUID.randomUUID()}"
  }

  /** Touch the lease mtime every staleAfterMs/3 while the body runs —
    * a live holder must never look stale. ALL beat failures are
    * swallowed (NonFatal, not just IOException: an object-store
    * connector's setTimes can throw UnsupportedOperationException,
    * and one such beat must degrade toward the documented
    * stale-takeover path, not silently kill the heartbeat and with
    * it the holder's liveness signal). */
  private def startHeartbeat(fs: FileSystem, lock: Path, staleAfterMs: Long): Thread = {
    val t = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(1000L, staleAfterMs / 3))
          try fs.setTimes(lock, System.currentTimeMillis(), -1)
          catch { case scala.util.control.NonFatal(_) => () }
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lease-heartbeat-${lock.getName}")
    t.setDaemon(true)
    t.start()
    t
  }

  /** Atomic create-if-absent returning false when the lock already
    * exists. nio for local paths (see class doc), Hadoop otherwise. */
  private def tryCreate(fs: FileSystem, lock: Path, tag: String): Boolean = {
    val body = (tag + "\n").getBytes("UTF-8")
    if (fs.getScheme == "file") {
      val nioPath = java.nio.file.Paths.get(lock.toUri.getPath)
      try {
        // parent dirs first: the Hadoop create() this replaces made
        // ancestors implicitly, and callers rely on that contract
        Option(nioPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.createFile(nioPath) // O_EXCL — truly atomic
        java.nio.file.Files.write(nioPath, body)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try {
        val out = fs.create(lock, false)
        try out.write(body) finally out.close()
        true
      } catch {
        // HDFS raises FileAlreadyExistsException (an IOException);
        // re-check existence so an unrelated IO failure still throws
        case e: java.io.IOException => if (fs.exists(lock)) false else throw e
      }
    }
  }

  private def readHolder(fs: FileSystem, lock: Path): Option[String] = {
    // a couple of read retries: a transient open/read failure right
    // after our own write must not masquerade as a foreign holder
    var attempt = 0
    while (attempt < 3) {
      try {
        val in = fs.open(lock)
        return Some(
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close())
      } catch { case _: java.io.IOException => attempt += 1; Thread.sleep(50L * attempt) }
    }
    None
  }

  private def acquire(fs: FileSystem, lock: Path, tag: String,
                      staleAfterMs: Long): Unit = {
    var attempts = 3 // bounded: create/vanish races retry, never loop
    var mayTakeOver = true
    while (attempts > 0) {
      attempts -= 1
      if (tryCreate(fs, lock, tag)) {
        // read-back: if a rival took over a stale lease between our
        // create and now (delete + re-create), the content is theirs
        // — abort instead of running two bodies under one lock name.
        // Only a READABLE FOREIGN tag aborts: we did create
        // atomically, so unreadable content (a transient read
        // failure) means we are almost certainly the owner — abort
        // there would strand our own fresh lock for the whole stale
        // window with no heartbeat.
        readHolder(fs, lock) match {
          case Some(holder) if holder != tag => throw new IllegalStateException(
            s"lost the takeover race for $lock to $holder — another writer re-acquired it; retry later")
          case _ => return
        }
      }
      val stOpt =
        try Some(fs.getFileStatus(lock))
        catch { case _: java.io.FileNotFoundException => None }
      stOpt match {
        case None => () // holder released between create and status — loop, create again
        case Some(st) =>
          val age = System.currentTimeMillis() - st.getModificationTime
          if (age > staleAfterMs && mayTakeOver) {
            mayTakeOver = false // one takeover per acquisition
            // presumed-crashed holder (a live one heartbeats): delete
            // ONLY if the status we re-read is the same one we judged
            // stale — a vanished or refreshed lock means someone beat
            // us to it, and deleting would kill THEIR fresh lease
            val fresh =
              try Some(fs.getFileStatus(lock))
              catch { case _: java.io.FileNotFoundException => None }
            if (fresh.exists(_.getModificationTime == st.getModificationTime))
              fs.delete(lock, false)
            // loop: next iteration races to the atomic re-create
          } else {
            throw new IllegalStateException(
              s"concurrent writer holds $lock (holder: ${readHolder(fs, lock).getOrElse("<unreadable>")}, " +
                s"age ${age / 1000}s): another process is building/compacting against this " +
                "root. Retry after it finishes, or delete the lock if its holder crashed " +
                s"<${staleAfterMs / 1000}s ago.")
          }
      }
    }
    throw new IllegalStateException(
      s"could not acquire $lock — lost 3 create races; retry later")
  }
}
