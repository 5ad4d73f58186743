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
 * Protocol: `_writer.lock` under the library root, created with
 * overwrite=false (atomic create-if-absent on HDFS and object stores
 * with preconditions; best-effort on raw local fs). The holder
 * heartbeats the file's mtime every `leaseMs / 3`; a lock whose mtime
 * is older than `leaseMs` is STALE (crashed holder) and may be broken
 * by the next acquirer. Reentrant within one holder instance — nested
 * mutations (updateDocument = delete + add) acquire depth, not a
 * second lease.
 */
final class WriterLock(fs: FileSystem, libRoot: String, leaseMs: Long) {
  import WriterLock._

  private val lockPath = new Path(s"$libRoot/_writer.lock")
  private val ownerId = java.util.UUID.randomUUID().toString
  private var depth = 0
  private var heartbeat: Option[java.util.Timer] = None

  /** Run `body` holding the lease; acquire on depth 0, release when
    * the outermost frame exits. Throws [[ConcurrentWriterException]]
    * if another live holder has the lock. */
  def withLock[T](body: => T): T = synchronized {
    if (depth == 0) acquire()
    depth += 1
    try body finally {
      depth -= 1
      if (depth == 0) release()
    }
  }

  private def acquire(): Unit = {
    var attempt = 0
    var held = false
    while (!held) {
      attempt += 1
      try {
        // parent must exist for create(); the library root is created
        // by the first mutation — make sure it is there
        fs.mkdirs(new Path(libRoot))
        val out = fs.create(lockPath, false) // overwrite=false: fail if held
        try out.write(
          s"$ownerId\n${System.currentTimeMillis()}\n".getBytes("UTF-8"))
        finally out.close()
        held = true
      } catch {
        case _: java.io.IOException if attempt <= 2 =>
          // lock exists: live holder → loud error; stale → break it
          val st = try Some(fs.getFileStatus(lockPath))
            catch { case _: java.io.FileNotFoundException => None }
          st match {
            case Some(s)
                if System.currentTimeMillis() - s.getModificationTime <= leaseMs =>
              val holder = try {
                val in = fs.open(lockPath)
                try scala.io.Source.fromInputStream(in, "UTF-8")
                  .getLines().nextOption().getOrElse("?") finally in.close()
              } catch { case _: Throwable => "?" }
              throw new ConcurrentWriterException(
                s"library at $libRoot is being mutated by writer $holder " +
                s"(lease fresh within ${leaseMs} ms) — concurrent mutation " +
                "would interleave manifest generations; retry after it " +
                "finishes or raise spark.graft.writerLockLeaseMs if its " +
                "process crashed")
            case Some(_) =>
              // stale: holder stopped heartbeating past the lease —
              // break and retry the atomic create (a racing breaker
              // loses the create and re-enters this arm)
              fs.delete(lockPath, false)
            case None => () // vanished between create and stat: retry
          }
      }
    }
    // heartbeat at a third of the lease so one missed beat never
    // expires a live holder
    val t = new java.util.Timer(s"graft-writer-lock-$ownerId", true)
    t.scheduleAtFixedRate(new java.util.TimerTask {
      override def run(): Unit =
        try fs.setTimes(lockPath, System.currentTimeMillis(), -1)
        catch { case _: Throwable => () }
    }, leaseMs / 3, leaseMs / 3)
    heartbeat = Some(t)
  }

  private def release(): Unit = {
    heartbeat.foreach(_.cancel())
    heartbeat = None
    // only remove our own lease (a breaker may have replaced it)
    try {
      val in = fs.open(lockPath)
      val owner = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().nextOption().getOrElse("") finally in.close()
      if (owner == ownerId) fs.delete(lockPath, false)
    } catch { case _: Throwable => () }
  }
}

object WriterLock {
  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)
}
