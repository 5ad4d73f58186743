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
 * Both hold on HDFS, POSIX-local, and hierarchical-namespace object
 * stores (ADLS Gen2) — the [[Hierarchical]] tier. A raw S3-style flat
 * store whose connector honors create-if-absent (S3 conditional
 * writes: If-None-Match PUT, public API since 2024) but whose rename
 * is clobbering copy+delete classifies as the [[ConditionalPut]]
 * tier and is SUPPORTED: guarantee 2's only load-bearing consumer —
 * the manifest-generation install — switches to a zero-rename
 * create-if-absent write at the final name (see [[Tier]] scaladoc
 * for the one documented lease-breaking degradation). A store that
 * violates create-if-absent itself fails LOUDLY at the first
 * mutation instead of letting the library corrupt silently under
 * concurrency. A deployment that guarantees single-writer discipline
 * externally can override with `spark.graft.unsafeFs=true` (the
 * probe's findings still print).
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

  /** Verified capability tier of a filesystem (per scheme+authority
    * per JVM):
    *  - [[Hierarchical]] — both guarantees hold (HDFS / POSIX / ADLS
    *    Gen2): every commit path is available, including
    *    rename-to-install.
    *  - [[ConditionalPut]] — create-if-absent holds but rename
    *    clobbers (raw S3-style flat store whose connector maps
    *    `create(overwrite=false)` to an If-None-Match conditional
    *    PUT — public S3 API since 2024). SUPPORTED: manifest
    *    generations install with the ZERO-RENAME path
    *    ([[graft.plans.ManifestedTree]] writes `_manifest.<gen>` at
    *    its final name via create-if-absent; object PUTs are atomic,
    *    so no reader ever sees a partial manifest), the writer lease
    *    acquires through the same conditional create, and data-file
    *    renames (rebuild tmp→live installs) need no atomicity —
    *    their destinations are fresh UUID names invisible until the
    *    manifest references them. One DEGRADATION, documented in the
    *    README matrix: breaking a STALE lease uses a rename-tombstone
    *    (copy+delete here), so a break racing a last-instant
    *    heartbeat can displace a live lease — which the displaced
    *    holder's heartbeat then flags loudly; nothing stays silent.
    *  - [[Unsupported]] — create-if-absent itself is violated (or the
    *    probe could not run): no lease protocol is possible; fail
    *    loudly unless spark.graft.unsafeFs=true. */
  sealed trait Tier
  case object Hierarchical extends Tier
  case object ConditionalPut extends Tier
  case object Unsupported extends Tier

  private val verified =
    scala.collection.concurrent.TrieMap.empty[String, Tier]

  private val ProbeErrorPrefix = "capability probe could not run: "

  private def keyOf(fs: FileSystem): String = {
    val u = fs.getUri
    s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}"
  }

  /** The tier [[verify]] established for this filesystem — None before
    * the first mutation verified it (read-only sessions). */
  def tierOf(fs: FileSystem): Option[Tier] = verified.get(keyOf(fs))

  /** True when manifest installs on this filesystem must use the
    * zero-rename create-if-absent path (conditional-put tier). */
  def noRenameCommit(fs: FileSystem): Boolean =
    verified.get(keyOf(fs)).contains(ConditionalPut)

  /** Probe `fs` (once per scheme+authority per JVM), classify its
    * tier, and throw [[UnsupportedFilesystemException]] on a
    * disqualifying violation unless `unsafeOverride`
    * (spark.graft.unsafeFs=true) is set. A clobbering rename ALONE
    * (create-if-absent honored) classifies [[ConditionalPut]] and is
    * supported via the zero-rename commit path, not an error. */
  def verify(fs: FileSystem, libRoot: String, unsafeOverride: Boolean): Unit = {
    val key = keyOf(fs)
    if (verified.contains(key)) return
    var failures = probe(fs, libRoot)
    // one retry when the probe itself could not run (transient IO on
    // an object store): a hiccup must not read as a contract verdict
    if (failures.exists(_.startsWith(ProbeErrorPrefix)))
      failures = probe(fs, libRoot)
    val createBad = failures.exists(_.contains("create(overwrite=false)"))
    val probeErr = failures.exists(_.startsWith(ProbeErrorPrefix))
    val renameOnly = failures.nonEmpty && !createBad && !probeErr &&
      failures.forall(_.contains("rename onto an existing path"))
    if (renameOnly) {
      System.err.println(s"[graft] filesystem $key: conditional-put " +
        "tier (create-if-absent honored, rename clobbers) — manifest " +
        "generations will install with the zero-rename create-if-" +
        "absent path; stale-lease BREAKING degrades to loud-flag " +
        "(see README, 'Filesystem support matrix')")
      verified.put(key, ConditionalPut)
      return
    }
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
      // overridden: record Unsupported so the tier is queryable but no
      // tier-gated path (zero-rename install) silently activates
      verified.put(key, Unsupported)
    } else verified.put(key, Hierarchical)
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
      // NonFatal only: an OutOfMemoryError/InterruptedException inside
      // the probe must propagate, not masquerade as an unverifiable
      // filesystem and get retried
      case scala.util.control.NonFatal(t) =>
        // a probe that cannot even run (permissions, exotic fs) is a
        // loud failure too — but tagged so verify() words it as
        // UNVERIFIABLE rather than a contract violation, and retries
        // once for transients
        out += s"$ProbeErrorPrefix${t.getMessage}"
    } finally {
      try fs.delete(dir, true)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    out.toSeq
  }

  /** Test seam: forget a verified filesystem so a spec can re-probe. */
  private[graft] def reset(): Unit = verified.clear()
}
