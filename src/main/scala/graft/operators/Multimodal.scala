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

  /** The decode kernel behind the injectable [[graft.MediaDecoder]]
    * seam: callers pass `decoder = null` for the default stub. */
  private def decoderOr(decoder: graft.MediaDecoder, dim: Int): graft.MediaDecoder =
    Option(decoder).getOrElse(new graft.StubMediaDecoder(dim))

  /**
   * Manufacture a binary "media" column from document text (the
   * testdata ships no real media), then run the standard multimodal
   * pipeline: payload -> (size, checksum, feature vector). The decode
   * step routes through [[graft.MediaDecoder]] — a real codec drops in
   * without touching the plan (schema, batching, partition flow are
   * decoder-independent).
   */
  def features(docs: DataFrame, dim: Int = 16,
               decoder: graft.MediaDecoder = null): DataFrame =
    featuresOf(docs, encode(col("text"), "UTF-8"), dim, decoder)

  /** [[features]] over a REAL binary media column (the production
    * entry point — the text-derived form above is the testdata
    * stand-in; same plan either way). */
  def featuresOf(docs: DataFrame, payload: org.apache.spark.sql.Column,
                 dim: Int = 16, decoder: graft.MediaDecoder = null): DataFrame = {
    val dec = decoderOr(decoder, dim)
    // Feature vector exploded to (pos, feat) scalar rows so outputs
    // carry no array columns (verification harness sorts/hashes rows).
    docs.select(
      col("doc_id"),
      length(payload).cast("long").as("media_bytes"),
      crc32(payload).as("media_checksum"),
      posexplode(dec.features(payload)).as(Seq("pos", "feat")))
      .select(col("doc_id"), col("media_bytes"), col("media_checksum"),
        // widen to double before rounding (cross-engine contract:
        // round the float's exact double value)
        col("pos"), round(col("feat").cast("double"), 6).as("feat"))
      .orderBy(col("doc_id").asc, col("pos").asc)
  }

  /**
   * Perceptual near-dup grouping for media payloads: the (stubbed)
   * feature vector collapses to its sign fingerprint — the pHash
   * shape: decode -> feature -> binarize -> group/compare on the
   * fixed-width code — and payloads sharing a fingerprint cluster
   * together. With a real decoder the same plan dedups re-encoded /
   * metadata-tweaked copies of one image that byte-level checksums
   * miss. One map-side pass to the 8-byte code, one group-by shuffle
   * carrying (code, count, min-id) only.
   */
  def nearDup(docs: DataFrame, dim: Int = 16,
              decoder: graft.MediaDecoder = null): DataFrame =
    nearDupOf(docs, encode(col("text"), "UTF-8"), dim, decoder)

  /** [[nearDup]] over a REAL binary media column. With a real decoder
    * ([[graft.ImageIoMediaDecoder]]) this groups re-encoded copies of
    * one image (png vs bmp of the same pixels) that byte-level
    * checksums miss — spec-proven. */
  def nearDupOf(docs: DataFrame, payload: org.apache.spark.sql.Column,
                dim: Int = 16, decoder: graft.MediaDecoder = null): DataFrame = {
    val dec = decoderOr(decoder, dim)
    require(dec.dim >= 1 && dec.dim <= 64, "fingerprint must fit one long")
    docs
      .select(col("doc_id"),
        bitPack(dec.features(payload)).getItem(0).as("sig"))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
      .orderBy(col("sig").asc)
  }

  /**
   * Frame sampling + downsample plumbing (the video half of the
   * multimodal pipeline): the payload is treated as a media container
   * and `nFrames` evenly-spaced byte windows are sampled from it; each
   * frame also gets a stride-2 "resized" view (every second byte — the
   * stand-in for a real resize kernel, same data flow). All per-frame
   * work is row-local binary slicing inside whole-stage codegen: at
   * 100 TB this is a map-only pass over the media column, no shuffle
   * until the presentation sort. Checksums make the whole pipeline
   * hash-verifiable cross-engine with no codec in the loop.
   */
  def frameSample(docs: DataFrame, nFrames: Int = 4): DataFrame = {
    val payload = encode(col("text"), "UTF-8") // stand-in media bytes
    val frames = docs
      .select(col("doc_id"), payload.as("media"),
        floor(length(payload) / nFrames).cast("int").as("flen"))
      // payloads shorter than nFrames bytes have no full frame
      .filter(col("flen") > 0)
      .select(col("doc_id"), col("media"), col("flen"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .withColumn("frame", expr("substring(media, frame_idx * flen + 1, flen)"))
    frames
      // stride-2 downsample via the hex view: bytes at even offsets
      // (guarded: sequence(0, -1) would generate a DESCENDING range)
      .withColumn("fhx", hex(col("frame")))
      .withColumn("ds", unhex(when(col("flen") >= 2,
        array_join(transform(sequence(lit(0), (col("flen") / 2).cast("int") - 1),
          j => col("fhx").substr(j * lit(4) + 1, lit(2))), ""))
        .otherwise(lit(""))))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * col("flen")).cast("long").as("frame_offset"),
        col("flen").as("frame_len"),
        crc32(col("frame")).as("frame_checksum"),
        (col("flen") / 2).cast("int").as("ds_len"),
        crc32(col("ds")).as("ds_checksum"))
      .orderBy(col("doc_id").asc, col("frame_idx").asc)
  }
}
