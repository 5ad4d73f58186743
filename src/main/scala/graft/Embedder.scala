package graft

import org.apache.spark.sql.Column

/**
 * Pluggable embedding provider — the injectable seam the reference
 * keeps between its services and the embedding backend
 * (/root/reference/services/embedding_service.py:58-233: a provider
 * object with doc/query input types, swapped in tests for a fake).
 *
 * The library calls `embed` with the chunk/query text column and the
 * reference's input type (`search_document` at ingest,
 * `search_query` at search time). Implementations return a column of
 * `Array[Float]` of length `dim`. A user bringing real embeddings
 * implements this trait — as a `mapInPandas`/UDF batch call into a
 * model server, or a join against a pre-computed embedding table —
 * and passes it to [[VectorLibrary]]; no library code changes. The
 * default [[DeterministicEmbedder]] keeps the zero-egress seeded
 * stand-in with the identical shape (dim, L2-normalized float
 * vectors, typed inputs).
 */
trait Embedder extends Serializable {
  /** Embedding dimension; validated against the library's. */
  def dim: Int

  /** Embed a text column. `inputType` is `search_document` or
    * `search_query` (reference embedding_service.py:169-233);
    * implementations may route the two through distinct encoders
    * (two-tower) or ignore the distinction (single-tower). */
  def embed(text: Column, inputType: String): Column
}

/** Default provider: the deterministic seeded hash embedder (the
  * Cohere stand-in — single-tower, so both input types share one
  * projection and the doc/query spaces stay aligned). */
final class DeterministicEmbedder(val dim: Int = 64, seed: Long = 42L)
    extends Embedder {
  def embed(text: Column, inputType: String): Column =
    GraftFunctions.embedTextTyped(text, inputType, dim, seed)
}
