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
}
