package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftFunctions._

/**
 * Multimodal column plumbing (SURVEY.md paragraph 2 G): media payloads ride as
 * opaque `binary` columns with typed metadata; decode / feature
 * extraction is a per-row columnar transform.
 *
 * The decode step is STUBBED (no image/audio codecs in this
 * environment) with a deterministic fake: payload bytes -> pseudo
 * feature vector via the seeded embedder over a hex view of the bytes.
 * Everything Spark-side — schema, batching, partition flow, feature
 * join-ability — is real: swapping the stub for a JNI/codec call does
 * not change the plan shape.
 */
object Multimodal {

  /**
   * Manufacture a binary "media" column from document text (the
   * testdata ships no real media), then run the standard multimodal
   * pipeline: payload -> (size, checksum, feature vector).
   */
  def features(docs: DataFrame, dim: Int = 16): DataFrame = {
    val payload = encode(col("text"), "UTF-8") // stand-in media bytes
    // Feature vector exploded to (pos, feat) scalar rows so outputs
    // carry no array columns (verification harness sorts/hashes rows).
    docs.select(
      col("doc_id"),
      length(payload).cast("long").as("media_bytes"),
      crc32(payload).as("media_checksum"),
      // STUB decode: deterministic feature vector from payload bytes.
      posexplode(embedText(hex(payload), dim)).as(Seq("pos", "feat")))
      .select(col("doc_id"), col("media_bytes"), col("media_checksum"),
        // widen to double before rounding (cross-engine contract:
        // round the float's exact double value)
        col("pos"), round(col("feat").cast("double"), 6).as("feat"))
      .orderBy(col("doc_id").asc, col("pos").asc)
  }
}
