package graft

import java.nio.file.Files
import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite

class FsCapabilitiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def localFs: FileSystem =
    FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)

  test("an honest filesystem passes the commit-semantics probe") {
    val dir = Files.createTempDirectory("graft-fsprobe").toString
    assert(FsCapabilities.probe(localFs, dir).isEmpty)
  }

  /** A store whose create-if-absent silently replaces — the raw
    * flat-object-store failure mode the guard exists for. */
  private def nonExclusiveCreateFs = new FilterFileSystem(localFs) {
    override def create(f: Path, permission: FsPermission,
        overwrite: Boolean, bufferSize: Int, replication: Short,
        blockSize: Long, progress: Progressable): FSDataOutputStream =
      super.create(f, permission, true, bufferSize, replication,
        blockSize, progress)
  }

  /** A store whose rename clobbers an existing destination
    * (copy+delete semantics). */
  private def clobberingRenameFs = new FilterFileSystem(localFs) {
    override def rename(src: Path, dst: Path): Boolean = {
      if (exists(dst)) delete(dst, false)
      super.rename(src, dst)
    }
  }

  test("a filesystem faking non-atomic create fails the probe loudly; unsafeFs overrides") {
    val dir = Files.createTempDirectory("graft-fsprobe-bad").toString
    val findings = FsCapabilities.probe(nonExclusiveCreateFs, dir)
    assert(findings.exists(_.contains("create(overwrite=false)")),
      s"probe missed the non-exclusive create: $findings")

    FsCapabilities.reset()
    val err = intercept[FsCapabilities.UnsupportedFilesystemException] {
      FsCapabilities.verify(nonExclusiveCreateFs, dir, unsafeOverride = false)
    }
    assert(err.getMessage.contains("spark.graft.unsafeFs"))
    // the explicit override lets a deployment with external
    // serialization proceed — loudly, and only when asked
    FsCapabilities.reset()
    FsCapabilities.verify(nonExclusiveCreateFs, dir, unsafeOverride = true)
    FsCapabilities.reset()
  }

  test("a filesystem whose rename clobbers an existing destination fails the probe") {
    val dir = Files.createTempDirectory("graft-fsprobe-ren").toString
    val findings = FsCapabilities.probe(clobberingRenameFs, dir)
    assert(findings.exists(_.contains("rename onto an existing path")),
      s"probe missed the clobbering rename: $findings")
  }

  test("a library mutation on an honest filesystem passes the guard end-to-end") {
    val root = Files.createTempDirectory("graft-fsprobe-lib").toString
    val lib = new VectorLibrary(spark, root, "probe-lib")
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(5)
    lib.addDocuments(docs) // first mutation runs the probe
    assert(lib.chunks.count() > 0)
    lib.delete()
  }

  test("clobbering rename with honest create classifies as the SUPPORTED conditional-put tier") {
    val dir = Files.createTempDirectory("graft-fsprobe-cput").toString
    FsCapabilities.reset()
    // rename-only violations are the flat-store tier: verify() accepts
    // and records the tier instead of throwing
    FsCapabilities.verify(clobberingRenameFs, dir, unsafeOverride = false)
    assert(FsCapabilities.tierOf(clobberingRenameFs)
      .contains(FsCapabilities.ConditionalPut), "tier not recorded")
    assert(FsCapabilities.noRenameCommit(clobberingRenameFs),
      "conditional-put tier must route manifest installs to the " +
      "zero-rename path")
    FsCapabilities.reset()
  }

  test("flat-store e2e: conditional-put tier mutates end-to-end with ZERO manifest renames") {
    // Register a flat-store simulator as its own scheme: rename
    // clobbers (copy+delete semantics) AND rename-to-install of any
    // manifest THROWS — so this spec proves the whole mutation flow
    // (ingest deltas, index rebuild replace-commits, cross-instance
    // stale-head refresh) never renames a manifest, end-to-end
    // through Spark writes, the lease protocol, and the probe.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftflat.impl", classOf[FlatStoreFs].getName)
    FsCapabilities.reset()
    val local = Files.createTempDirectory("graft-flatlib").toString
    val root = s"graftflat:$local"
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val lib = new VectorLibrary(spark, root, "flat-lib")
    lib.addDocuments(docs.where("doc_id % 2 = 0").limit(3))
    val flatFs = new Path(root).getFileSystem(conf)
    assert(FsCapabilities.tierOf(flatFs)
      .contains(FsCapabilities.ConditionalPut),
      "probe did not classify the flat scheme as conditional-put")
    val n1 = lib.chunks.count()
    assert(n1 > 0, "flat-store ingest produced no chunks")
    // delta commit through the direct create-if-absent install
    lib.addDocuments(docs.where("doc_id % 2 = 1").limit(3))
    val n2 = lib.chunks.count()
    assert(n2 > n1, "second flat-store ingest did not land")
    // replace-all commit (index rebuild) through the same path
    lib.buildPartitionedIndex()
    assert(lib.searchApprox("stream filter join", 3).count() > 0,
      "flat-store partitioned index unservable")
    // cross-instance stale head: instance B advances the store, then
    // A's next commit must be refused by create-if-absent (NOT
    // silently clobbered), refresh, and re-derive onto a fresh
    // generation — the flat-store replacement for the rename-path's
    // explicit exists probe
    val libB = new VectorLibrary(spark, root, "flat-lib")
    libB.addDocuments(docs.where("doc_id % 4 = 2").limit(2))
    lib.addDocuments(docs.where("doc_id % 4 = 3").limit(2))
    val nAll = lib.chunks.count()
    assert(nAll > n2, "post-stale-head commits lost rows")
    assert(libB.chunks.count() == nAll,
      "instances disagree on the committed store")
    FsCapabilities.reset()
  }
}

/** A flat-store simulator for [[FsCapabilitiesSpec]], registered under
  * its own `graftflat:` scheme so every layer (Spark writes, lease
  * protocol, manifest installs) resolves it from the path: rename
  * clobbers an existing destination (copy+delete semantics) and
  * renaming anything to a `_manifest.*` name THROWS — proving the
  * conditional-put commit path never rename-installs a manifest —
  * while create(overwrite=false) refuses existing paths (the
  * conditional-PUT guarantee). */
class FlatStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftflat"
  override def getUri: java.net.URI = java.net.URI.create("graftflat:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (dst.getName.startsWith("_manifest."))
      throw new java.io.IOException(
        s"flat store: rename-to-install is forbidden for manifests: $dst")
    if (exists(dst)) delete(dst, true)
    super.rename(src, dst)
  }
}
