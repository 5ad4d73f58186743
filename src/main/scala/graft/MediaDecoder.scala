package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Pluggable media-decode seam — the [[Embedder]] pattern applied to
 * the multimodal pipeline (the reference keeps the same injectable
 * boundary between services and the embedding backend,
 * /root/reference/services/embedding_service.py:58-233; media codecs
 * are this library's scale extension and get the identical seam).
 *
 * [[operators.Multimodal]] calls `features` with the opaque binary
 * payload column; implementations return a column of `Array[Float]`
 * of length `dim`. A user bringing a real image/audio codec implements
 * this trait — typically a `mapInPandas`-style batch call into the
 * codec, or a join against a precomputed feature table — and passes
 * it to the operators; the Spark-side plumbing (schema, partition
 * flow, fingerprinting, group-by shape) is unchanged. The default
 * [[StubMediaDecoder]] keeps the zero-egress deterministic stand-in
 * (no codecs ship in this environment).
 */
trait MediaDecoder extends Serializable {
  /** Feature dimension produced by [[features]]. */
  def dim: Int

  /** Decode + feature-extract a binary payload column into an
    * `Array[Float]` feature vector of length [[dim]]. Must be
    * deterministic per payload byte-string (the near-dup grouping and
    * the cross-engine verification both rely on it). */
  def features(payload: Column): Column
}

/** Default stub decoder: deterministic pseudo features via the seeded
  * text embedder over a hex view of the payload bytes — same shape
  * (dim floats, codegen'd, map-side) as a real decode kernel. */
final class StubMediaDecoder(val dim: Int = 16) extends MediaDecoder {
  def features(payload: Column): Column =
    GraftFunctions.embedText(hex(payload), dim)
}

/** PRODUCTION decoder through the seam: pure-JVM image decode
  * (javax.imageio — PNG/BMP/GIF readers ship with the JDK, no native
  * libs) + block-mean luminance features on a ceil(sqrt(dim)) grid,
  * as a native codegen'd expression
  * ([[graft.functions.ImageFeatures]]). Undecodable payloads map to
  * the zero vector, deterministically, so fingerprints and near-dup
  * groups stay replayable. Drop-in proof that the seam carries a real
  * codec: identical schema, identical map-side plan shape, the
  * multimodal operators unchanged. */
final class ImageIoMediaDecoder(val dim: Int = 16) extends MediaDecoder {
  def features(payload: Column): Column =
    call_function("graft_image_features", payload, lit(dim))
}
