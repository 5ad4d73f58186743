package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftFunctions._

/**
 * Training-data pipeline primitives beyond the reference's API surface
 * (SURVEY.md section 2 extension): deterministic dataset splitting and
 * token-budget shard packing — the two bookkeeping ops every corpus
 * pipeline runs between dedup/filtering and the trainer.
 */
object Pipeline {

  /**
   * Deterministic train/val/test split: each document's bucket in
   * [0, 100) is a pure function of (doc_id, seed), so the assignment
   * is reproducible across runs, engines, and cluster sizes — no RNG
   * state, no sampling drift when the corpus grows (a doc's split
   * never changes as others arrive). Map-only at any scale.
   */
  def sampleSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10,
                  seed: Long = 42L): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    // The native graft_mix64 wraps like Java (ANSI mode would reject
    // plain Column multiplies); >>> 1 clears the sign bit so the
    // modulo stays in [0, 100).
    val bucket = (shiftrightunsigned(mix64(col("doc_id") + lit(seed)), 1) % 100)
      .cast("int")
    docs.select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Token-budget shard packing: within each source, documents (in
   * doc_id order) are packed greedily into shards of ~`budgetTokens`
   * — shard = exclusive-prefix-sum of token counts / budget, so a
   * shard closes once its budget is crossed. Partitioned by source:
   * each source packs independently and in parallel; the within-source
   * prefix sum is one window over a (source)-partitioned exchange —
   * at 100 TB this is range-partitioned cumulative-sum shape, the
   * standard distributed scan for packing problems.
   */
  def shardPack(docs: DataFrame, budgetTokens: Int = 4096): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"),
      textStats(col("text")).getField("n_tokens").as("n_tokens"))
      .withColumn("shard_idx",
        ((sum(col("n_tokens")).over(w) - col("n_tokens")) / budgetTokens)
          .cast("int"))
      .orderBy(col("doc_id").asc)
  }
}
