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
