package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorLibrarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("library lifecycle: ingest, search, stats, delete") {
    val root = Files.createTempDirectory("graft-lib").toString
    val lib = new VectorLibrary(spark, root, "test-lib")
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(100)
    lib.addDocuments(docs)

    val nChunks = lib.chunks.count()
    assert(nChunks > 0)

    val hits = lib.search("spark join stream table filter", k = 5).collect()
    assert(hits.length == 5)
    assert(hits.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))

    val approx = lib.searchApprox("spark join stream table filter", k = 5).collect()
    assert(approx.nonEmpty)

    val st = lib.stats.collect()(0)
    assert(st.getAs[Long]("vector_count") == nChunks)
    assert(st.getAs[Int]("dimension") == 64)

    // batch fetch + per-document chunk listing (reference
    // get_chunks_batch / GET /documents/{id}/chunks)
    val someIds = lib.chunks.limit(3).collect().map(_.getAs[String]("chunk_id")).toSeq
    assert(lib.chunksBatch(someIds).count() == 3)
    val dc = lib.documentChunks(docs.head.getAs[Long]("doc_id")).collect()
    assert(dc.nonEmpty)
    assert(dc.map(_.getAs[Int]("chunk_idx")).toSeq == dc.indices.toSeq)

    // incremental add (the reference's background re-index path)
    lib.addDocuments(docs.withColumn("doc_id", col("doc_id") + 100000))
    assert(lib.chunks.count() == 2 * nChunks)

    lib.delete()
    assertThrows[Exception](lib.chunks.count())
  }

  test("copy-on-write delete and update flows") {
    val root = Files.createTempDirectory("graft-lib-crud").toString
    val lib = new VectorLibrary(spark, root, "crud-lib")
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(20)
    lib.addDocuments(docs)
    val before = lib.chunks.count()

    lib.deleteDocuments(col("doc_id") < 5)
    assert(lib.chunks.filter(col("doc_id") < 5).count() == 0)
    assert(lib.chunks.count() < before)

    val replacement = docs.filter(col("doc_id") === 7)
      .withColumn("text", lit("entirely new replacement text body"))
    lib.updateDocument(7L, replacement)
    val updated = lib.chunks.filter(col("doc_id") === 7).collect()
    assert(updated.nonEmpty)
    assert(updated.head.getAs[String]("chunk_text").contains("replacement"))
    lib.delete()
  }

  test("indexed search paths, algorithm switching, validation, index info") {
    val root = Files.createTempDirectory("graft-lib-algo").toString
    val lib = new VectorLibrary(spark, root, "algo-lib")
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(60)
    lib.addDocuments(docs)

    // searchApprox serves from the persisted lsh_buckets column: the
    // only signature work in the plan is the query-side probe — no
    // graft_lsh_buckets recompute over the corpus.
    val approx = lib.searchApprox("spark join stream table filter", k = 5)
    val phys = approx.queryExecution.executedPlan.toString
    assert(!phys.contains("graft_lsh_buckets"),
      s"corpus-side signature recompute in:\n$phys")
    // (the query-side graft_lsh_probes call constant-folds into a
    // literal bucket array at plan time — even better than runtime)
    assert(phys.contains("lsh_buckets"), "stored index column not scanned")
    assert(approx.collect().nonEmpty)

    // live per-library algorithm switching (reference
    // set_library_algorithm, tests/test_integration_algorithms.py)
    for (algo <- Seq("flat", "lsh", "grid", "ivf", "quantized")) {
      lib.setAlgorithm(algo)
      val hits = lib.search("spark join stream table filter", k = 3).collect()
      assert(hits.length == 3, s"algo=$algo returned ${hits.length} rows")
      assert(hits.map(_.getDouble(1)).sliding(2).forall(p => p.head >= p.last),
        s"algo=$algo not sorted by score desc")
    }
    assertThrows[IllegalArgumentException](lib.setAlgorithm("hnsw"))
    lib.setAlgorithm("flat")

    // k clamp [1,100] (search_schema.py:26) + query-dim validation
    assert(lib.search("spark", k = 500).count() <= 100)
    assert(lib.search("spark", k = -3).count() == 1)
    assertThrows[IllegalArgumentException](lib.searchVector(Seq.fill(32)(0.1f)))

    // LSH bucket-occupancy histogram (LSHIndex.get_stats analog)
    val info = lib.indexInfo.collect()(0)
    val total = info.getAs[Int]("total_buckets")
    assert(total == 8 * 256)
    assert(info.getAs[Long]("occupied_buckets") + info.getAs[Long]("empty_buckets") == total)
    assert(info.getAs[Long]("max_bucket_size") >= 1)
    assert(info.getAs[Double]("avg_bucket_size") >= 1.0)
    lib.delete()
  }

  test("rebuildIndex and compact preserve content; embed input types validated") {
    val root = Files.createTempDirectory("graft-lib-maint").toString
    val lib = new VectorLibrary(spark, root, "maint-lib")
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(30)
    // several small appends = the streaming-ingest file layout
    lib.addDocuments(docs.filter(col("doc_id") < 10))
    lib.addDocuments(docs.filter(col("doc_id") >= 10 && col("doc_id") < 20))
    lib.addDocuments(docs.filter(col("doc_id") >= 20))
    val before = lib.chunks.count()
    val hitsBefore = lib.search("spark join stream", k = 5).collect().map(_.getString(0))

    def parquetFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$root/maint-lib/chunks"))
        .count(_.getName.endsWith(".parquet"))
    }
    val filesBefore = parquetFiles()
    lib.compact(numPartitions = 1)
    assert(parquetFiles() < filesBefore, s"compaction did not merge files ($filesBefore)")
    assert(lib.chunks.count() == before)

    lib.rebuildIndex()
    assert(lib.chunks.count() == before)
    assert(lib.chunks.filter(col("lsh_buckets").isNull || col("quant").isNull).count() == 0)
    val hitsAfter = lib.search("spark join stream", k = 5).collect().map(_.getString(0))
    assert(hitsBefore.sameElements(hitsAfter), "maintenance changed search results")

    assertThrows[IllegalArgumentException](
      GraftFunctions.embedTextTyped(col("text"), "clustering"))
    lib.delete()
  }

  test("streaming ingest embeds and indexes arriving documents") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-lib-stream").toString
    val docsDir = Files.createTempDirectory("graft-docs").toString
    val lib = new VectorLibrary(spark, root, "stream-lib")

    Tables.load(spark, SparkTestSession.sfDir, "documents").limit(50)
      .write.mode("overwrite").parquet(docsDir)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    val q = lib.ingestStream(stream, s"$root/ckpt")
    q.processAllAvailable(); q.stop()

    assert(lib.chunks.count() > 0)
    val hits = lib.search("spark join stream", k = 3).collect()
    assert(hits.length == 3)
    lib.delete()
  }
}
