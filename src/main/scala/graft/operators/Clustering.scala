package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.GraftFunctions._

/**
 * Embedding-space corpus clustering: the dataset-card view of an
 * embedding column (topic structure, cluster occupancy, exemplars)
 * and the SemDeDup-style semantic near-dup pass built on it.
 *
 * Reference alignment: the reference serves per-library k-NN but has
 * no corpus-structure view; this is the training-data-pipeline
 * extension (cluster-then-curate, Abbas et al. 2023 "SemDeDup",
 * public arXiv:2303.09540) expressed Spark-first:
 *  - the k-means fit is a one-off bounded MLlib job (same fit the IVF
 *    index uses — clusters and IVF cells are the same artifact);
 *  - assignment is [[IvfIndex.assignExact]]: a map-side fold argmin
 *    against the broadcast centroid literal — no shuffle, replayable
 *    bit-for-bit by the DuckDB oracle;
 *  - the card is ONE aggregation shuffled on the (dense, small-int)
 *    cluster key; the exemplar resolves in the same shuffle via a
 *    per-cluster rank window.
 *
 * Cross-engine sum discipline: per-row squared distances quantize to
 * 6 dp and sum as DECIMAL — exact and order-independent — so the
 * cluster means hash-match no matter how either engine orders the
 * aggregation (a raw double sum would be partition-order dependent).
 */
object Clustering {

  /** Corpus rows + `cluster` + the raw fold squared distance `sqd`
    * to the assigned centroid (the same struct array_min that
    * assignExact reduces over, keeping both fields). */
  private[graft] def assignWithDist(rows: DataFrame, vecCol: String,
      centers: Seq[(Int, Array[Double])]): DataFrame = {
    val centLit = typedLit(centers.map { case (i, c) => (i, c.toSeq) })
    val dists = transform(centLit, c => struct(
      aggregate(zip_with(col(vecCol).cast("array<double>"), c.getField("_2"),
        (x, y) => (x - y) * (x - y)), lit(0.0), _ + _).as("d"),
      c.getField("_1").as("cluster")))
    val best = array_min(dists)
    rows.withColumn("cluster", best.getField("cluster"))
      .withColumn("sqd", best.getField("d"))
  }

  /**
   * Embedding-space outlier gate: flag vectors whose squared distance
   * to their assigned centroid exceeds the cluster's mean + nSigma
   * stddev — the data-quality pass that catches corrupt embeddings,
   * mis-encoded rows, and genuine distribution strays before they
   * poison nearest-neighbor training batches. Per-cluster statistics
   * from exact DECIMAL sums of the 6-dp-quantized distances (d6^2 is
   * 12-dp exact), so mean/std replay identically cross-engine; the
   * flag compares quantized distance to the quantized threshold.
   * One assignment pass + one tiny per-cluster aggregate (broadcast
   * back) — map-side dominant at any scale.
   */
  def embeddingOutliers(emb: DataFrame, centers: Seq[(Int, Array[Double])],
                        nSigma: Double = 2.0, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    def quant6(c: Column): Column = graft.operators.TextAnalysis.quant6(c)
    // the assignment frame feeds BOTH the stats aggregate and the
    // flag join — pin it so the centroid fold runs once, not twice
    // (same discipline as source_overlap's shared gram set)
    // (r14: a scaleScan inside the pin was tried and reverted — the
    // extra exchange cost more than the parallel fold saved at test
    // scale, A/B 0.62 -> 0.69 s, and is an identity on split inputs.)
    val a = graft.GraftFunctions.pin(
      assignWithDist(emb.select(col(idCol), col(vecCol)), vecCol, centers)
        .withColumn("d6", round(col("sqd"), 6)))
    val stats = a.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(col("d6").cast("decimal(28,6)")).cast("double").as("s1"),
        sum((col("d6") * col("d6")).cast("decimal(38,12)")).cast("double").as("s2"))
      .select(col("cluster"),
        quant6(col("s1") / col("n") + lit(nSigma) *
          sqrt(greatest(col("s2") / col("n")
            - (col("s1") / col("n")) * (col("s1") / col("n")), lit(0.0))))
          .as("threshold"))
    a.join(broadcast(stats), Seq("cluster"))
      .select(col(idCol), col("cluster"), col("d6").as("sqd"),
        col("threshold"), (col("d6") > col("threshold")).as("is_outlier"))
      .orderBy(col(idCol).asc)
  }

  /**
   * Per-cluster dataset card: occupancy, mean squared distance to the
   * centroid (cohesion), and the exemplar (member nearest its
   * centroid, lowest id on ties) — the row a curator reads to label
   * the cluster.
   */
  def clusterCard(emb: DataFrame, centers: Seq[(Int, Array[Double])],
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    // (r14: a scaleScan here was tried and reverted — the k x dim fold
    // is microseconds per row, cheaper than the exchange it would add
    // at test scale, and the single consumer's aggregate shuffles the
    // tiny per-cluster partials anyway. A/B: 0.49 -> 0.55 s.)
    val a = assignWithDist(emb.select(col(idCol), col(vecCol)), vecCol, centers)
      .withColumn("sqd6", round(col("sqd"), 6).cast("decimal(28,6)"))
    // exemplar = argmin(sqd, id) AS a struct-min — it folds into the
    // same hash aggregate as the counts (map-side partials, one row
    // per cluster per partition at the exchange), where a rank window
    // would sort every cluster's full membership first
    a.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("sqd6")).cast("double") / count(lit(1)), 6).as("avg_sqdist"),
        min(struct(col("sqd"), col(idCol))).as("ex"))
      .select(col("cluster"), col("n_vectors"), col("avg_sqdist"),
        col("ex").getField(idCol).as("exemplar_id"))
      .orderBy(col("cluster").asc)
  }

  /**
   * Diversity-capped sampling: keep at most `cap` vectors per k-means
   * cluster, chosen by the same deterministic splitmix64 rank the
   * mix/split samplers use (id tie-break) — the "don't let one dense
   * mode dominate the training mix" curation pass that pairs with
   * [[semanticDedup]]. One map-side assignment + one rank window over
   * a cluster-partitioned exchange; membership is a pure function of
   * (corpus, centers, seed), so the oracle replays it exactly.
   */
  def clusterSample(emb: DataFrame, centers: Seq[(Int, Array[Double])],
                    cap: Int = 100, seed: Long = 42L, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(cap >= 0, "cap must be >= 0")
    // No scaleScan (r14, measured): the single consumer is the
    // cluster-partitioned rank window, whose own exchange already
    // redistributes — a pre-repartition is a pure extra shuffle at
    // test scale (A/B: 0.27 -> 0.53 s) and an identity at 100 TB.
    val a = IvfIndex.assignExact(emb.select(col(idCol), col(vecCol)), vecCol, centers)
    val rk = shiftrightunsigned(mix64(col(idCol) + lit(seed)), 1)
    val w = Window.partitionBy(col("cluster")).orderBy(rk.asc, col(idCol).asc)
    a.select(col(idCol), col("cluster"))
      .withColumn("sample_rank", row_number().over(w))
      .withColumn("kept", col("sample_rank") <= cap)
      .orderBy(col(idCol).asc)
  }

  /**
   * Per-dimension distribution-shift monitor between two corpus
   * snapshots (nightly crawl vs the serving corpus): the means are
   * taken over 6-dp-quantized components summed as DECIMAL — exact
   * and order-independent, so the drift report hash-matches across
   * engines and partitionings. One explode + one 64-key aggregation
   * per side; map-side partial aggregation collapses each partition
   * to 64 rows before the exchange, so the shuffle is O(partitions),
   * not O(corpus x dims).
   */
  def embeddingDrift(oldE: DataFrame, newE: DataFrame,
                     vecCol: String = "embedding"): DataFrame = {
    def meansOf(df: DataFrame, tag: String): DataFrame =
      df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
        .withColumn("x6", round(col("x"), 6).cast("decimal(28,6)"))
        .groupBy(col("dim"))
        .agg(round(sum(col("x6")).cast("double") / count(lit(1)), 6).as(s"mean_$tag"))
    meansOf(oldE, "old").join(meansOf(newE, "new"), Seq("dim"))
      .select(col("dim"), col("mean_old"), col("mean_new"),
        round(abs(col("mean_new") - col("mean_old")), 6).as("abs_delta"))
      .orderBy(col("dim").asc)
  }

  /**
   * SemDeDup: semantic near-dup detection blocked by k-means cluster.
   * Candidate pairs are within-cluster only — the cluster plays the
   * LSH bucket's role, so candidate generation shuffles the corpus
   * once on a dense small-int key and never forms cross-cluster
   * pairs. Output is LINEAR in the corpus (the keep/drop decision,
   * not the pair list): each vector that has a semantically-near
   * lower-id cluster-mate reports its single best match.
   *
   * At 100 TB the cluster count grows with the corpus (the same
   * sqrt(n) rule the IVF cell count follows), bounding within-cluster
   * pair fan-out; duplicates by construction land in the same cell
   * (they are near the same centroid), which is exactly why SemDeDup
   * prunes inside clusters only.
   */
  def semanticDedup(emb: DataFrame, centers: Seq[(Int, Array[Double])],
                    threshold: Double = 0.3, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    // Pinned + scaleScan (r14): the assignment frame feeds BOTH legs
    // of the within-cluster self-join, and the centroid argmin fold
    // (k x dim HOF against the inlined centroid literal) otherwise
    // re-evaluates per leg — AND duplicates into the join's Filter
    // condition, i.e. 4 kernel runs per row, serialized on a 1-split
    // scan (r13 plan, guide §2.5/§4). One parallel pass, cached rows.
    val a = graft.GraftFunctions.pin(IvfIndex.assignExact(
      graft.GraftFunctions.scaleScan(emb.select(col(idCol), col(vecCol))),
      vecCol, centers))
    val pairs = a.as("a").join(a.as("b"),
        col(s"a.cluster") === col(s"b.cluster") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"b.$idCol").as("vec_id"), col(s"a.$idCol").as("dup_of"),
        round(cosineSim(col(s"a.$vecCol"), col(s"b.$vecCol")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
    // best match = argmax(cos_sim, smallest dup_of) as a struct-max
    // hash aggregate (the minhashIncremental pattern): partials
    // collapse map-side, no per-vec_id sort of the candidate pairs.
    // The smallest-id tie-break negates NUMERIC ids only (the same
    // type dispatch finishPerQueryTopK applies); any other orderable
    // idCol keeps the rank-window form — correctness over the
    // aggregate's shuffle savings for exotic id types.
    emb.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        pairs.groupBy(col("vec_id"))
          .agg(max(struct(col("cos_sim"), (-col("dup_of")).as("nid"))).as("m"))
          .select(col("vec_id"), (-col("m.nid")).as("dup_of"),
            col("m.cos_sim").as("cos_sim"))
          .orderBy(col("vec_id").asc)
      case _ =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id"))
          .orderBy(col("cos_sim").desc, col("dup_of").asc)
        pairs.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
          .select(col("vec_id"), col("dup_of"), col("cos_sim"))
          .orderBy(col("vec_id").asc)
    }
  }
}
