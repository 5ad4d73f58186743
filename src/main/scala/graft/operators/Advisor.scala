package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Index-strategy advisor: corpus profile -> recommended index
 * algorithm + parameters.
 *
 * The reference picks a search strategy from corpus size silently
 * inside the query path (vector_db/similarity.py:303-358). Under
 * Spark's execution model a per-query switch is vacuous — the index
 * choice is an INGEST-time decision that fixes the persisted layout —
 * so the capability ports as an explicit advisory view a pipeline
 * consults when (re)building a library, not a hidden branch. The
 * recommendation implements the standard public sizing rules:
 *
 *  - below ~10k vectors the flat scan wins: every index's fixed
 *    per-probe costs (two jobs: shortlist + re-rank) exceed one
 *    codegen'd corpus pass;
 *  - from there to ~1M, IVF with nCells ~ sqrt(n) (the classic
 *    inverted-file balance: probe cost ~ nProbe * n / nCells,
 *    centroid scan ~ nCells — minimized together at sqrt(n)) and
 *    nProbe ~ nCells/16 (the 4-of-64 ratio whose recall the repo's
 *    stress runs measure at 1.00);
 *  - above ~1M, IVF-PQ with the same cell rule: phase-1 cost per
 *    probed cell drops from dim floats to m code bytes per row, the
 *    difference that dominates once cells hold >> 10k rows.
 *
 * Thresholds are advisory constants, overridable per call; every
 * output column is deterministic arithmetic over (count, dimension),
 * so the view is oracle-replayable end to end.
 */
object Advisor {

  /** Recommended algorithm for a corpus of `n` vectors. */
  def algorithmFor(n: Column, flatMax: Long = 10000L, ivfMax: Long = 1000000L): Column =
    when(n < flatMax, lit("flat"))
      .when(n < ivfMax, lit("ivf"))
      .otherwise(lit("ivfpq"))

  /** sqrt(n) cell-count rule; 0 for corpora served flat. */
  def cellsFor(n: Column, flatMax: Long = 10000L): Column =
    when(n < flatMax, lit(0)).otherwise(ceil(sqrt(n.cast("double"))).cast("int"))

  /** nProbe ~ cells/16, at least 1; 0 when unindexed. */
  def probesFor(cells: Column): Column =
    when(cells === 0, lit(0))
      .otherwise(greatest(lit(1), ceil(cells.cast("double") / 16).cast("int")))

  /**
   * One advisory row per corpus: (n_vectors, dimension, algorithm,
   * n_cells, n_probe, est_rows_per_cell). `est_rows_per_cell` is the
   * expected probe-side scan unit n/nCells — the number a capacity
   * plan multiplies by bytes/row.
   */
  def indexAdvisor(emb: DataFrame, vecCol: String = "embedding",
                   flatMax: Long = 10000L, ivfMax: Long = 1000000L): DataFrame = {
    val cells = cellsFor(col("n_vectors"), flatMax)
    emb.agg(count(lit(1)).as("n_vectors"),
        max(size(col(vecCol))).as("dimension"))
      .select(col("n_vectors"), col("dimension"),
        algorithmFor(col("n_vectors"), flatMax, ivfMax).as("algorithm"),
        cells.as("n_cells"),
        probesFor(cells).as("n_probe"),
        when(cells === 0, col("n_vectors"))
          .otherwise(ceil(col("n_vectors").cast("double") / cells).cast("long"))
          .as("est_rows_per_cell"))
  }
}
