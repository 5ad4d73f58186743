package graft

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * One-time-per-filesystem probe of the commit-semantics contract the
 * storage layer is built on. Two guarantees are load-bearing:
 *
 *  1. **create-if-absent refuses an existing path** — [[WriterLock]]
 *     acquires its lease with `create(overwrite = false)` (plus POSIX
 *     O_EXCL on local filesystems); a filesystem that silently
 *     overwrites would grant two writers one lease, and every
 *     interleaving the lock exists to prevent becomes possible.
 *  2. **rename does not clobber an existing destination** — manifest
 *     generations and lease tombstones install by rename
 *     ([[graft.plans.ManifestedTree]], [[WriterLock]] breakStale); a
 *     clobbering rename could overwrite a concurrent writer's
 *     just-committed generation.
 *
 * True on HDFS, POSIX-local, and hierarchical-namespace object stores
 * (ADLS Gen2). NOT true on raw S3-style flat stores, where rename is
 * copy+delete and create preconditions vary by connector — there the
 * probe fails LOUDLY at the first mutation instead of letting the
 * library corrupt silently under concurrency. A deployment that
 * guarantees single-writer discipline externally can override with
 * `spark.graft.unsafeFs=true` (the probe's findings still print).
 *
 * The probe is behavioral — it detects a filesystem that VISIBLY
 * violates the contract (silent double-create, clobbering rename).
 * Race atomicity itself is not probeable from one process; the README
 * support matrix documents which tier each guarantee needs.
 *
 * Runs once per (scheme, authority) per JVM, at the first mutation of
 * any library on that filesystem (read-only sessions never probe).
 */
object FsCapabilities {
  final class UnsupportedFilesystemException(msg: String)
    extends RuntimeException(msg)

  private val verified =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  private val ProbeErrorPrefix = "capability probe could not run: "

  /** Probe `fs` (once per scheme+authority per JVM) and throw
    * [[UnsupportedFilesystemException]] on a contract violation unless
    * `unsafeOverride` (spark.graft.unsafeFs=true) is set. */
  def verify(fs: FileSystem, libRoot: String, unsafeOverride: Boolean): Unit = {
    val u = fs.getUri
    val key = s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}"
    if (verified.contains(key)) return
    var failures = probe(fs, libRoot)
    // one retry when the probe itself could not run (transient IO on
    // an object store): a hiccup must not read as a contract verdict
    if (failures.exists(_.startsWith(ProbeErrorPrefix)))
      failures = probe(fs, libRoot)
    if (failures.nonEmpty) {
      val verdict =
        if (failures.forall(_.startsWith(ProbeErrorPrefix)))
          // accurate wording: UNVERIFIABLE, not "violates" — the
          // probe never observed the semantics
          s"filesystem $key could not be VERIFIED against the " +
          "commit-semantics contract graft's storage layer requires " +
          "(the probe itself failed — possibly transient)"
        else
          s"filesystem $key VIOLATES the commit-semantics contract " +
          "graft's storage layer requires"
      val msg = s"$verdict:\n  - " +
        failures.mkString("\n  - ") +
        "\nSingle-writer discipline cannot be enforced on this " +
        "filesystem; use HDFS / a POSIX mount / a hierarchical-" +
        "namespace object store, or set spark.graft.unsafeFs=true " +
        "if mutation is externally serialized (see README, " +
        "'Filesystem support matrix')."
      if (unsafeOverride)
        System.err.println(s"[graft] UNSAFE-FS OVERRIDE ACTIVE — $msg")
      else throw new UnsupportedFilesystemException(msg)
    }
    verified.put(key, ())
  }

  /** The behavioral probe, separable for specs: returns the list of
    * observed contract violations (empty = contract honored). */
  private[graft] def probe(fs: FileSystem, libRoot: String): Seq[String] = {
    val dir = new Path(
      s"$libRoot/_fs_probe_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = scala.collection.mutable.Buffer.empty[String]
    def write(p: Path, body: String): Unit = {
      val o = fs.create(p, true)
      try o.write(body.getBytes("UTF-8")) finally o.close()
    }
    def readBack(p: Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    try {
      fs.mkdirs(dir)
      val a = new Path(dir, "a")
      val b = new Path(dir, "b")
      write(a, "A")
      // guarantee 1: create-if-absent must refuse an existing path
      val refused =
        try { val o = fs.create(a, false); o.close(); false }
        catch { case _: java.io.IOException => true } // FileAlreadyExists is an IOE
      if (!refused)
        out += "create(overwrite=false) silently replaced an existing " +
          "file — writer-lease acquisition would grant two concurrent " +
          "writers one lease"
      // guarantee 2: rename must not clobber an existing destination
      write(a, "A")
      write(b, "B")
      val renamed = try fs.rename(a, b)
        catch { case _: java.io.IOException => false }
      if (renamed)
        out += "rename onto an existing path clobbered the destination " +
          "— a manifest/lease install could overwrite a concurrent " +
          "writer's commit"
      else if (readBack(b) != "B")
        out += "rename onto an existing path corrupted the destination " +
          "content"
    } catch {
      case t: Throwable =>
        // a probe that cannot even run (permissions, exotic fs) is a
        // loud failure too — but tagged so verify() words it as
        // UNVERIFIABLE rather than a contract violation, and retries
        // once for transients
        out += s"$ProbeErrorPrefix${t.getMessage}"
    } finally {
      try fs.delete(dir, true) catch { case _: Throwable => () }
    }
    out.toSeq
  }

  /** Test seam: forget a verified filesystem so a spec can re-probe. */
  private[graft] def reset(): Unit = verified.clear()
}
