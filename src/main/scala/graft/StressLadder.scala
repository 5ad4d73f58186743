package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-5 scale ladder: IVF-PQ probe/batch at 4M and 16M vectors (the
 * round-3/4 tables stop at 4M, and measured ivfpq only at 1M). The
 * build follows the 100 TB discipline end to end:
 *  - the geometry (64 coarse centroids + residual codebooks) fits on a
 *    bounded SAMPLE of the corpus — the fit cost is constant in corpus
 *    size;
 *  - the FULL corpus encodes map-side under the frozen geometry
 *    (IvfPq.encodeFrozen — the same path streaming appends use) and
 *    lands in one cluster-partitioned write.
 * What must hold as the corpus quadruples: probe and batch wall times
 * stay FLAT (phase 1 reads the codes of nProbe/64 cells, never the
 * corpus), while the reference full scan grows linearly.
 *
 * The cell count must SCALE with the corpus (the classic ~sqrt(n)
 * inverted-file rule): at fixed nCentroids a probe's nProbe cells each
 * hold corpus/nCentroids rows, so probe cost re-grows linearly once
 * fixed costs are amortized — measured at 16M/64 cells (1.37s vs
 * 0.67s at 4M/64) and restored flat by 16M/256 cells. At 100 TB the
 * cell count is an ingest-time knob, not a code change.
 *
 * Run: `sbt "runMain graft.StressLadder 2000 64"` (4M) /
 *      `8000 256` (16M at the sqrt(n)-scaled cell count).
 */
object StressLadder {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 8000
    val nCells = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.configure(spark)

    val tmp = java.nio.file.Files.createTempDirectory("graft-ladder").toString
    val base = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    base.crossJoin(spark.range(copies))
      .select((col("id") * 1000000 + col("vec_id")).as("vec_id"), col("embedding"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$tmp/vectors")
    val corpus = spark.read.parquet(s"$tmp/vectors")
    val n = corpus.count()
    println(s"[ladder] corpus: $n vectors x 64 dims")

    // fit small: geometry from a bounded sample — constant cost at any
    // corpus size (the replicated corpus has the base distribution)
    val t0 = System.nanoTime()
    val sample = corpus.sample(math.min(1.0, 500000.0 / n), 42L)
    val geo = operators.IvfPq.train(sample, "embedding", nCentroids = nCells)
    println(f"[ladder] geometry fit (bounded sample): ${(System.nanoTime() - t0) / 1e9}%.1fs")
    // encode everywhere: frozen-geometry map-side encode + one
    // cluster-partitioned write (linear, embarrassingly parallel)
    val t1 = System.nanoTime()
    operators.IvfPq.writeIndex(
      operators.IvfPq.Index(geo.centers, geo.books,
        operators.IvfPq.encodeFrozen(corpus, "embedding", geo.centers, geo.books)),
      s"$tmp/ivfpq")
    println(f"[ladder] frozen encode + partitioned write: ${(System.nanoTime() - t1) / 1e9}%.1fs")

    val q = base.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val queries16 = base.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def time(name: String)(body: => Long): Unit = {
      body // warmup
      val best = (1 to 2).map { _ =>
        val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
      }.min
      println(f"[ladder] $name: $best%.2fs")
    }
    val idx = operators.IvfPq.Index(
      operators.IvfPq.readCenters(spark, s"$tmp/ivfpq"),
      operators.IvfPq.readBooks(spark, s"$tmp/ivfpq"),
      spark.read.parquet(s"$tmp/ivfpq/encoded"))
    time("ivfpq_probe(nProbe=4, codes-only phase 1)") {
      operators.IvfPq.search(idx, q, "vec_id", "embedding", 10, 4,
        metric = "cosine").count() }
    time("ivfpq_batch_16q(one union-pruned codes scan)") {
      operators.IvfPq.searchBatch(idx, queries16, "vec_id", "embedding", 10, 4,
        metric = "cosine").count() }
    val exactTop = operators.VectorSearch.knnFlat(corpus, q, "vec_id", "embedding",
      10, "cosine").collect().map(_.getLong(0)).toSet
    val pqTop = operators.IvfPq.search(idx, q, "vec_id", "embedding", 10, 4,
      metric = "cosine").collect().map(_.getLong(0))
    println(f"[ladder] ivfpq_recall@10 vs exact: ${pqTop.count(exactTop).toDouble / 10}%.2f")
    time("knn_flat(full-scan reference)") {
      operators.VectorSearch.knnFlat(corpus, q, "vec_id", "embedding", 10,
        "cosine").count() }

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
