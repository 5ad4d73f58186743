package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.types.StructType

/**
 * A partitioned parquet tree whose LIVE file set is published through a
 * root-level `_manifest.txt` — the reusable commit-and-open discipline
 * behind every derived index layout the library persists (LSH buckets,
 * IVF/IVF-PQ cluster assignments, grid cells, PQ codes).
 *
 * What the manifest buys at 100 TB, per layout:
 *  - OPEN COST: a reader plans from one small file via
 *    [[ManifestFileIndex]] — zero filesystem list/stat calls instead of
 *    a recursive listing over thousands of partition directories.
 *  - ATOMIC COMMITS: appends, copy-on-write deletes and compactions
 *    publish by swapping the manifest (tmp + rename), so a concurrent
 *    reader always plans against one complete generation and a crashed
 *    writer's orphan files are invisible by construction.
 *
 * Lifecycle contract (single mutating writer, many readers — the COW
 * discipline the library already assumes):
 *  - a full rebuild (Overwrite write) commits via [[commitSnapshot]];
 *  - an incremental append goes through [[appendCommitted]], which
 *    commits exactly the batch's own files via a touched-directory
 *    listing diff around the write;
 *  - a copy-on-write file swap commits via [[commitSwap]];
 *  - a compaction's directory republish via [[commitDirReplacement]].
 * Trees written before the manifest existed read via listing
 * (unchanged behavior) and upgrade to a snapshot at their next commit.
 *
 * Reference behavior served: the persisted index lifecycles of
 * sternbergm/vector-db-service (services/persistence.py pickles whole
 * indexes per mutation and re-reads them per process); here a mutation
 * commits one manifest line-set and an open is one small file read at
 * any index size.
 */
final class ManifestedTree(
    spark: SparkSession,
    val root: String,
    partitionSchema: StructType) {

  private def fs = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val manifestFile = s"$root/_manifest.txt"

  // One open per manifest generation: every commit path lands in
  // writeManifest, which drops the cached frame.
  @volatile private var openCache: Option[DataFrame] = None
  def invalidate(): Unit = openCache = None

  /** Manifest entries are `relativePath<TAB>sizeBytes`. Sizes ride in
    * the manifest so split planning needs ZERO stat calls; a legacy
    * size-less line parses with size -1 and demotes that generation's
    * read to the per-file-stat path until the next commit rewrites it. */
  def readManifest(): Option[Seq[(String, Long)]] = {
    val p = new org.apache.hadoop.fs.Path(manifestFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      Some(raw.split('\n').map(_.trim).filter(_.nonEmpty).toSeq.map { line =>
        line.split('\t') match {
          case Array(path, size) => (path, size.toLong)
          case _ => (line, -1L)
        }
      })
    }
  }

  def writeManifest(files: Seq[(String, Long)]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$root/._manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write(files.sortBy(_._1)
      .map { case (p, s) => s"$p\t$s" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dest = new org.apache.hadoop.fs.Path(manifestFile)
    fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"manifest: cannot install $manifestFile")
    openCache = None
  }

  /** (relative path, size) of the visible files under this tree — the
    * whole tree, or the given partition subdirectories only. */
  def listFiles(dirs: Option[Seq[String]] = None): Seq[(String, Long)] =
    ManifestedTree.listTree(spark, root, dirs)

  /** Append a batch and commit exactly ITS files to the manifest: the
    * new files are identified by a touched-directory listing DIFF
    * around the write, so a crashed writer's orphans sitting in the
    * same directories are never adopted (they stay invisible until a
    * maintenance vacuum). Commit cost tracks the batch's directories,
    * never the tree. A pre-manifest tree upgrades to a full snapshot
    * instead — its listing is already the source of truth. */
  def appendCommitted(rows: DataFrame, maxRecordsPerFile: Long): Unit = {
    val partCols = partitionSchema.fieldNames.toSeq
    val touched = rows.selectExpr(partCols: _*).distinct().collect()
      .map { r =>
        partCols.indices.map { i =>
          val v = if (r.isNullAt(i)) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
            else ExternalCatalogUtils.escapePathName(r.get(i).toString)
          s"${partCols(i)}=$v"
        }.mkString("/")
      }.toSeq
    val manifestBefore = readManifest()
    val pre =
      if (manifestBefore.isDefined) listFiles(Some(touched)).map(_._1).toSet
      else Set.empty[String]
    rows.write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCols: _*).parquet(root)
    manifestBefore match {
      case Some(base) =>
        writeManifest(base ++ listFiles(Some(touched)).filterNot(f => pre(f._1)))
      case None => writeManifest(listFiles(None))
    }
  }

  /** Publish the full on-disk tree — the commit of an Overwrite
    * rebuild (the writer's own output is the complete live set). */
  def commitSnapshot(): Unit = writeManifest(listFiles(None))

  /** Commit a copy-on-write file swap: the victim files leave the
    * manifest, the replacement files (captured from the rewrite's tmp
    * tree BEFORE the swap consumed it) join it. `victimsAbs` are
    * absolute victim paths as the resolution scan reported them. */
  def commitSwap(victimsAbs: Seq[String], fresh: Seq[(String, Long)]): Unit = {
    val rootStr = {
      val s = fs.makeQualified(new org.apache.hadoop.fs.Path(root)).toUri.getPath
      if (s.endsWith("/")) s else s + "/"
    }
    val victimsRel = victimsAbs
      .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath
        .stripPrefix(rootStr)).toSet
    readManifest() match {
      case Some(base) => writeManifest(base.filterNot(f => victimsRel(f._1)) ++ fresh)
      case None => writeManifest(listFiles(None))
    }
  }

  /** Commit a compaction: every manifest entry under `dirPrefixes`
    * (each ending in "/") is replaced by the compacted `moved` files. */
  def commitDirReplacement(dirPrefixes: Seq[String],
                           moved: Seq[(String, Long)]): Unit = {
    val base = readManifest().getOrElse(listFiles(None))
    writeManifest(
      base.filterNot(f => dirPrefixes.exists(f._1.startsWith)) ++ moved)
  }

  /** The tree as a DataFrame, memoized per manifest generation:
    * manifest-planned ([[ManifestFileIndex]] — zero list/stat calls,
    * partition pruning kept) when sizes are present; a legacy
    * size-less manifest demotes to the per-file read (one stat per
    * entry); no manifest falls back to the recursive listing. */
  def open(): DataFrame = openCache.getOrElse {
    val df = readManifest() match {
      case Some(entries) if entries.nonEmpty && entries.forall(_._2 >= 0) =>
        ManifestFileIndex.read(spark, root, entries, partitionSchema)
      case Some(entries) if entries.nonEmpty =>
        spark.read.option("basePath", root)
          .parquet(entries.map(f => s"$root/${f._1}"): _*)
      case _ => spark.read.parquet(root)
    }
    openCache = Some(df)
    df
  }
}

object ManifestedTree {
  /** (relative path, size) of the visible files under `treeRoot` — the
    * whole tree, or the given partition subdirectories only. */
  def listTree(spark: SparkSession, treeRoot: String,
               dirs: Option[Seq[String]]): Seq[(String, Long)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(treeRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def visible(n: String) = !n.startsWith(".") && !n.startsWith("_")
    def filesUnder(d: Path, rel: String): Seq[(String, Long)] =
      if (!fs.exists(d)) Seq.empty
      else fs.listStatus(d).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (!visible(n)) Seq.empty
        else if (st.isDirectory) filesUnder(st.getPath, s"$rel$n/")
        else Seq((s"$rel$n", st.getLen))
      }
    dirs match {
      case Some(ds) => ds.flatMap(d => filesUnder(new Path(s"$treeRoot/$d"), s"$d/"))
      case None => filesUnder(new Path(treeRoot), "")
    }
  }
}
