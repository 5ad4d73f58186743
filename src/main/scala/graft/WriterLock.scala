package graft

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * A lease-based writer lock for a library root — the loud-error
 * insurance the single-mutating-writer discipline needs once two
 * sessions can reach one store.
 *
 * Every persisted layout here assumes ONE mutating writer (the COW
 * delete resolution, the manifest commit protocol, compaction's
 * listing-based census all document it). The reference enforces the
 * same invariant in-process: vector_db/storage.py guards every mutation
 * with a per-process RLock, and services/background_tasks.py serializes
 * index rebuilds per library. Across processes sharing a filesystem
 * that guarantee must live ON the filesystem — this lock turns a
 * second concurrent writer into a [[WriterLock.ConcurrentWriterException]]
 * instead of silently interleaved manifest generations.
 *
 * Protocol: `_writer.lock` under the library root, created atomically
 * if absent (fs.create(overwrite=false) on HDFS and object stores with
 * preconditions; POSIX O_EXCL on a local filesystem, where Hadoop's
 * local create is exists-then-create and NOT atomic), then read back
 * to confirm our content survived the create. The file carries
 * `ownerId\nlastBeatMs`; the holder heartbeats every `leaseMs / 3` by
 * advancing the mtime, falling back to rewriting the content timestamp
 * on filesystems where setTimes is unsupported (several object-store
 * connectors) — staleness always evaluates max(mtime, content ts), so
 * either channel keeps the lease alive. A lock whose freshest timestamp
 * is older than `leaseMs` is STALE (crashed holder) and may be broken.
 *
 * Breaking is TOCTOU-safe: the breaker atomically RENAMES the stale
 * lock to a unique tombstone (exactly one racing breaker's rename
 * succeeds — a plain delete could remove a FRESH lease created between
 * the breaker's stat and its delete), then re-checks the displaced
 * file's timestamp. Genuinely stale → tombstone deleted, create
 * proceeds; fresh (the tiny stat→rename window caught a new lease) →
 * renamed back and the breaker reports the live holder. If the
 * rename-back loses a further race the displaced holder is not silent:
 * its next heartbeat sees foreign/missing lock content, flags the lease
 * LOST, and the mutation call itself fails loudly on exit — at no point
 * do two writers both hold an unflagged lease.
 *
 * Reentrant within one holder instance — nested mutations
 * (updateDocument = delete + add) acquire depth, not a second lease.
 */
final class WriterLock(fs: FileSystem, libRoot: String, leaseMs: Long) {
  import WriterLock._

  private val lockPath = new Path(s"$libRoot/_writer.lock")
  private val ownerId = java.util.UUID.randomUUID().toString
  private var depth = 0
  private var heartbeat: Option[java.util.Timer] = None
  private val beatMisses = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var lost = false

  /** True while the CURRENT THREAD is inside a [[withLock]] frame of
    * this instance. Deliberately NOT `synchronized{depth > 0}`:
    * withLock holds this monitor for the whole mutation, so a blocking
    * probe from another thread would wait out the entire mutation —
    * and deadlock outright when that prober already holds a tree lease
    * the mutation is acquiring. Thread.holdsLock never blocks, and
    * when it is true we own the monitor, making the depth read safe;
    * when false the answer is false regardless of depth (callers ask
    * "am I inside the all-tree frame", a per-thread question). */
  def held: Boolean = Thread.holdsLock(this) && depth > 0

  /** True when the holder's lease can no longer be trusted: the
    * heartbeat found foreign/missing lock content (a breaker displaced
    * us) or failed `LostAfterMisses` consecutive beats. The in-flight
    * mutation finishes, but its `withLock` call throws on exit so the
    * possible interleaving is never silent. */
  def leaseLost: Boolean = lost

  /** Run `body` holding the lease; acquire on depth 0, release when
    * the outermost frame exits. Throws [[ConcurrentWriterException]]
    * if another live holder has the lock, or — after `body` completes —
    * if the lease was lost while it ran. */
  def withLock[T](body: => T): T = synchronized {
    if (depth == 0) acquire()
    else if (lost) throw new ConcurrentWriterException(
      s"writer lease on $libRoot was lost mid-mutation (heartbeat saw a " +
      "foreign or missing lock) — a concurrent writer may have broken " +
      "the lease; verify the store and retry")
    depth += 1
    var ok = false
    try { val r = body; ok = true; r } finally {
      depth -= 1
      if (depth == 0) {
        val wasLost = lost
        release()
        if (ok && wasLost) throw new ConcurrentWriterException(
          s"writer lease on $libRoot was lost while this mutation ran " +
          "(heartbeat could not maintain or verify the lock) — another " +
          "writer may have interleaved; verify the store (repairIndexes) " +
          "before trusting this commit")
      }
    }
  }

  /** Lock-file content: `ownerId\nlastBeatMs`. Returns (owner, beatMs)
    * or None if unreadable/missing. */
  private def readLock(p: Path): Option[(String, Long)] =
    try readLockStrict(p) catch { case _: Throwable => None }

  /** Like [[readLock]] but only FileNotFound maps to None — an IO
    * error propagates, so the heartbeat can tell "the lock is GONE"
    * (displacement — a correctness signal) from "the filesystem
    * hiccuped" (a transient to retry). */
  private def readLockStrict(p: Path): Option[(String, Long)] =
    try {
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().take(2).toList finally in.close()
      lines match {
        case owner :: ts :: _ => Some((owner, ts.trim.toLongOption.getOrElse(0L)))
        case owner :: Nil     => Some((owner, 0L))
        case _                => None
      }
    } catch { case _: java.io.FileNotFoundException => None }

  /** Freshest evidence of life: max(file mtime, content timestamp) —
    * mtime is the cheap heartbeat channel, content the fallback for
    * filesystems where setTimes is a no-op. -1 if the file is gone. */
  private def lastBeat(p: Path): Long =
    try {
      val mtime = fs.getFileStatus(p).getModificationTime
      math.max(mtime, readLock(p).map(_._2).getOrElse(0L))
    } catch { case _: Throwable => -1L }

  private def writeLock(overwrite: Boolean): Unit = {
    val body = s"$ownerId\n${System.currentTimeMillis()}\n".getBytes("UTF-8")
    val uri = fs.makeQualified(lockPath).toUri
    val local = uri.getScheme == null || uri.getScheme == "file"
    if (!overwrite && local) {
      // Hadoop's local create(path, overwrite=false) is exists-then-
      // create — NOT atomic, and two acquirers under load can both pass
      // the exists check. POSIX O_EXCL (CREATE_NEW) is the atomic
      // create-if-absent a local fs actually offers; HDFS and
      // precondition-capable object stores are atomic through fs.create
      // already. FileAlreadyExistsException is an IOException — the
      // acquire retry arm handles it like any lost create.
      val p = java.nio.file.Paths.get(uri.getPath)
      java.nio.file.Files.createDirectories(p.getParent)
      val ch = java.nio.file.Files.newByteChannel(p,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.CREATE_NEW)
      try ch.write(java.nio.ByteBuffer.wrap(body)) finally ch.close()
    } else {
      val out = fs.create(lockPath, overwrite)
      try out.write(body) finally out.close()
    }
  }

  private def acquire(): Unit = {
    lost = false
    beatMisses.set(0)
    var attempt = 0
    var held = false
    while (!held) {
      attempt += 1
      try {
        // parent must exist for create(); the library root is created
        // by the first mutation — make sure it is there
        fs.mkdirs(new Path(libRoot))
        writeLock(overwrite = false) // fail if held
        // belt-and-braces for filesystems whose create-if-absent is
        // weaker than claimed: the lease is ours only if OUR content
        // survived the create. Retry transient read errors — throwing
        // on a read hiccup would abandon our OWN fresh lock and block
        // every writer for a full lease; if the read stays unreadable,
        // proceed held and let the heartbeat's ownership verification
        // flag any real displacement loudly.
        val readBack = (0 until 3).iterator.map { i =>
          if (i > 0) Thread.sleep(20)
          try readLockStrict(lockPath)
          catch { case _: java.io.IOException => None }
        }.collectFirst { case Some(o) => o }
        readBack match {
          case Some((o, _)) if o != ownerId =>
            throw new java.io.IOException(
              s"lock create race lost: content is owned by $o")
          case _ => () // ours, or unreadable (heartbeat re-verifies)
        }
        held = true
      } catch {
        case _: java.io.IOException if attempt <= 4 =>
          // lock exists: live holder → loud error; stale → break it
          val beat = lastBeat(lockPath)
          if (beat < 0) {
            () // vanished between create and stat: retry the create
          } else if (System.currentTimeMillis() - beat <= leaseMs) {
            val holder = readLock(lockPath).map(_._1).getOrElse("?")
            throw new ConcurrentWriterException(
              s"library at $libRoot is being mutated by writer $holder " +
              s"(lease fresh within ${leaseMs} ms) — concurrent mutation " +
              "would interleave manifest generations; retry after it " +
              "finishes or raise spark.graft.writerLockLeaseMs if its " +
              "process crashed")
          } else breakStale(attempt)
      }
    }
    // heartbeat at a third of the lease so one missed beat never
    // expires a live holder
    val t = new java.util.Timer(s"graft-writer-lock-$ownerId", true)
    t.scheduleAtFixedRate(new java.util.TimerTask {
      override def run(): Unit = beat()
    }, leaseMs / 3, leaseMs / 3)
    heartbeat = Some(t)
  }

  /** Break a stale lease WITHOUT the delete TOCTOU: atomically rename
    * the stale lock to a unique tombstone (exactly one racing breaker
    * wins the rename — the loser re-enters the acquire loop and finds
    * either no lock or the winner's fresh one), then re-verify
    * staleness on the displaced file. If the stat→rename window caught
    * a FRESH lease (its owner broke + re-created in between), restore
    * it and report the live holder. */
  private def breakStale(attempt: Int): Unit = {
    val tomb = new Path(
      s"$libRoot/_writer.lock.breaking.$ownerId.$attempt")
    val won = try fs.rename(lockPath, tomb)
      catch { case _: java.io.IOException => false }
    if (!won) return // lost the break race; the retry loop re-evaluates
    val beat = lastBeat(tomb)
    if (beat >= 0 && System.currentTimeMillis() - beat <= leaseMs) {
      // we displaced a LIVE lease — put it back and report the holder.
      // If the restore loses a further race (a third writer created a
      // new lock in this microsecond window) the displaced holder's
      // heartbeat flags itself lost; nothing stays silent.
      val restored = try fs.rename(tomb, lockPath)
        catch { case _: Throwable => false }
      if (!restored) { try fs.delete(tomb, false)
        catch { case _: Throwable => () } }
      throw new ConcurrentWriterException(
        s"library at $libRoot is being mutated by a live writer (its " +
        "lease refreshed between staleness check and break" +
        (if (restored) "; lease restored" else "") + ") — retry after " +
        "it finishes")
    }
    // genuinely stale: drop the tombstone; the loop retries the create
    try fs.delete(tomb, false) catch { case _: Throwable => () }
  }

  /** One heartbeat: verify the lock is still OURS, then advance its
    * mtime — falling back to a content-timestamp rewrite when setTimes
    * is unsupported or silently ignored. Failures are never swallowed
    * into nothing, but neither does one transient trip a false abort:
    *
    *  - an I/O ERROR (object-store 503, timeout) counts toward
    *    `LostAfterMisses` consecutive misses — only a persistent
    *    failure, i.e. a full lease window without a successful beat,
    *    flags the lease lost;
    *  - MISSING or FOREIGN lock content is a displacement signal, but
    *    a breaker's rename-check-restore window can legitimately make
    *    the file vanish for a microsecond-scale moment — one short
    *    (50 ms) same-beat recheck distinguishes the two without
    *    opening a whole beat interval of unflagged displacement;
    *  - a successful owned beat resets the miss counter. Once `lost`
    *    is set it stays set: the mutation's integrity is unknown. */
  private def beat(): Unit = {
    val now = System.currentTimeMillis()
    try {
      readLockStrict(lockPath) match {
        case Some((owner, _)) if owner == ownerId =>
          try fs.setTimes(lockPath, now, -1)
          catch { case _: Throwable => () }
          val mtime = try fs.getFileStatus(lockPath).getModificationTime
            catch { case _: Throwable => 0L }
          // setTimes unsupported / no-op on this fs: keep the lease
          // alive through the content channel instead
          if (mtime + leaseMs / 3 <= now) writeLock(overwrite = true)
          beatMisses.set(0)
        case other =>
          // A breaker's rename-check-restore can displace the file for
          // one MICROSECOND-scale window; waiting a whole beat interval
          // to re-check would let a genuinely displaced holder finish
          // its mutation unflagged. Re-read after a short pause in THIS
          // beat instead: long enough for any restore rename, far
          // shorter than any mutation.
          Thread.sleep(50)
          val recheck = try readLockStrict(lockPath)
            catch { case _: Throwable => None }
          if (recheck.exists(_._1 == ownerId)) {
            System.err.println(
              s"[graft] writer-lock beat on $libRoot saw the lock " +
              s"${other.map(o => s"owned by ${o._1}").getOrElse("missing")} " +
              "transiently — restored on recheck (breaker window)")
          } else {
            lost = true
            System.err.println(
              s"[graft] writer lease on $libRoot LOST: lock file is " +
              s"${recheck.map(o => s"owned by ${o._1}").getOrElse("missing")} " +
              "after recheck — a breaker displaced this holder; the " +
              "current mutation will fail loudly on exit")
          }
      }
    } catch { case e: Throwable =>
      val n = beatMisses.incrementAndGet()
      System.err.println(
        s"[graft] writer-lock heartbeat failure $n/$LostAfterMisses on " +
        s"$libRoot: ${e.getMessage}")
      if (n >= LostAfterMisses) lost = true
    }
  }

  private def release(): Unit = {
    heartbeat.foreach(_.cancel())
    heartbeat = None
    // only remove our own lease (a breaker may have replaced it)
    try {
      if (readLock(lockPath).exists(_._1 == ownerId))
        fs.delete(lockPath, false)
    } catch { case _: Throwable => () }
  }
}

object WriterLock {
  /** Consecutive heartbeat failures after which the holder stops
    * trusting its own lease (≈ one full lease window at beat = lease/3). */
  val LostAfterMisses = 3

  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)
}
