package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftFunctions._
import graft.operators.{TextAnalysis, VectorSearch}

/**
 * Library-level facade: the reference service's API surface
 * (create library / add documents / auto-chunk / embed / index /
 * search / stats / delete — routers/library_router.py,
 * services/library_service.py + vector_service.py) re-expressed as
 * dataset transforms over a parquet-backed store.
 *
 * Differences by design (SURVEY.md paragraph 3): persistence is parquet (not
 * PostgreSQL), embeddings come from the deterministic seeded embedder
 * (not Cohere), and "index build" materializes index columns
 * (LSH buckets) next to the data so a 1000-executor scan can
 * partition-prune instead of consulting driver-side state.
 */
class VectorLibrary(spark: SparkSession, root: String, val name: String,
                    dim: Int = 64, seed: Long = 42L) {
  SparkEntry.configure(spark)

  private val path = s"$root/$name/chunks"

  /**
   * Ingest documents (doc_id, text, source): chunk into fixed word
   * windows, embed each chunk, precompute LSH buckets, append to the
   * library store. The write is partitioned by source so per-source
   * queries prune files.
   */
  def addDocuments(docs: DataFrame, chunkWindow: Int = 32): Unit = {
    TextAnalysis.chunksUnordered(docs, chunkWindow)
      .withColumn("embedding", embedText(col("chunk_text"), dim, seed))
      .withColumn("lsh_buckets", lshBuckets(col("embedding"), 8, 8, seed))
      .withColumn("chunk_id",
        concat_ws("#", lit(name), col("doc_id"), col("chunk_idx")))
      .write.mode(SaveMode.Append).partitionBy("source").parquet(path)
  }

  /** All chunks of this library. */
  def chunks: DataFrame = spark.read.parquet(path)

  /** k-NN search by query text (the reference's POST /search). */
  def search(queryText: String, k: Int = 10, metric: String = "cosine"): DataFrame = {
    val q = spark.range(1).select(embedText(lit(queryText), dim, seed).as("qvec"))
    VectorSearch.knnFlat(chunks.select(col("chunk_id"), col("embedding")),
      q, "chunk_id", "embedding", k, metric)
  }

  /** Approximate search through the precomputed LSH index columns. */
  def searchApprox(queryText: String, k: Int = 10): DataFrame = {
    val q = spark.range(1).select(embedText(lit(queryText), dim, seed).as("qvec"))
    VectorSearch.lshKnn(chunks.select(col("chunk_id"), col("embedding")),
      q, "chunk_id", "embedding", k, seed = seed)
  }

  /** Library stats (reference GET /libraries/{id}/index-info, incl.
    * the vector-storage memory estimate of algorithms.py:197-201). */
  def stats: DataFrame = {
    chunks.agg(
      count(lit(1)).as("vector_count"),
      max(size(col("embedding"))).as("dimension"),
      countDistinct(col("doc_id")).as("n_documents"),
      countDistinct(col("source")).as("n_sources"),
      round(avg(col("n_tokens")), 4).as("avg_chunk_tokens"),
      sum(when(col("embedding").isNull, 1).otherwise(0)).as("unindexed_chunks"))
      .withColumn("est_memory_mb",
        round(col("vector_count") * col("dimension") * 4 / lit(1024.0 * 1024.0), 3))
      .withColumn("library", lit(name))
  }

  /** Chunks whose embedding is missing (reference get_unindexed_chunks). */
  def unindexed: DataFrame = chunks.filter(col("embedding").isNull)

  /**
   * Streaming ingest: the reference's background embedding task
   * (services/background_tasks.py:15-40 — embed-and-index each new
   * chunk as it arrives) as a Structured Streaming pipeline. New
   * document files landing in `docsPath` are chunked, embedded, and
   * appended to the library store incrementally.
   */
  def ingestStream(docsStream: DataFrame, checkpoint: String,
                   chunkWindow: Int = 32): org.apache.spark.sql.streaming.StreamingQuery = {
    TextAnalysis.chunksUnordered(docsStream, chunkWindow)
      .withColumn("embedding", embedText(col("chunk_text"), dim, seed))
      .withColumn("lsh_buckets", lshBuckets(col("embedding"), 8, 8, seed))
      .withColumn("chunk_id",
        concat_ws("#", lit(name), col("doc_id"), col("chunk_idx")))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .partitionBy("source")
      .format("parquet")
      .option("path", path)
      .start()
  }

  /**
   * Delete documents by predicate (reference DELETE /chunks,
   * /documents): lake-style copy-on-write — rewrite the store without
   * the victims. At 100 TB the same flow runs per partition (only
   * partitions containing victims rewrite, the rest are untouched
   * files), which is exactly how Delta/Iceberg deletes compile.
   */
  def deleteDocuments(predicate: org.apache.spark.sql.Column): Unit = {
    // Null-safe keep condition: a NULL predicate result must KEEP the
    // row (three-valued logic would silently drop it from filter(!p)).
    val survivors = chunks.filter(not(coalesce(predicate, lit(false))))
    val tmpPath = s"$root/$name/.chunks_rewrite"
    survivors.write.mode(SaveMode.Overwrite).partitionBy("source").parquet(tmpPath)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val live = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(tmpPath)
    val aside = new org.apache.hadoop.fs.Path(s"$root/$name/.chunks_old")
    // Swap via rename-aside: a crash mid-sequence leaves the old data
    // recoverable at `aside` instead of losing the store entirely.
    fs.delete(aside, true)
    fs.rename(live, aside)
    if (!fs.rename(tmp, live)) {
      fs.rename(aside, live) // roll back
      throw new java.io.IOException(s"deleteDocuments: swap failed for $path")
    }
    fs.delete(aside, true)
  }

  /**
   * Update a document's text (reference PUT /chunks + background
   * re-embed, services/chunk_service.py:100-127): delete the old
   * chunks, re-chunk/re-embed/re-index the new content.
   */
  def updateDocument(docId: Long, newDocs: DataFrame): Unit = {
    deleteDocuments(col("doc_id") === docId)
    addDocuments(newDocs)
  }

  /** Drop the library store (reference DELETE /libraries/{id}). */
  def delete(): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/$name"), true)
  }
}
