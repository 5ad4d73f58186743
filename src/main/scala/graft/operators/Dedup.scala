package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraftFunctions._

/**
 * Deduplication suite for large text corpora (SURVEY.md paragraph 2 D).
 *
 * All variants follow the same scale shape: signatures are computed
 * map-side in one pass (codegen'd expressions), candidate generation
 * shuffles only compact keys (hash / band / block), and expensive
 * verification runs only on candidate pairs.
 */
object Dedup {

  /** Tokens of lowercased text ([a-z0-9] runs), empties removed.
    * Native single-pass tokenizer — same contract as
    * `filter(split(lower(c), "[^a-z0-9]+"), _ =!= "")` but codegen'd
    * (regex + interpreted HOF dominated text-query profiles). */
  def tokens(c: Column): Column = tokensOf(c)

  /**
   * Exact dedup: group by content hash. Emits one row per distinct
   * content with its cardinality — `n_docs > 1` rows are the dup sets.
   */
  def exact(docs: DataFrame): DataFrame = {
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
      .orderBy(col("content_hash").asc)
  }

  /**
   * MinHash + LSH near-dup pairs: 64-hash signature, banded into
   * `numBands` buckets; pairs sharing any band bucket are verified by
   * signature agreement (estimated Jaccard) >= threshold.
   */
  def minhashLsh(docs: DataFrame, numHashes: Int = 64, numBands: Int = 16,
                 threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    val rowsPerBand = numHashes / numBands
    // Docs too short to produce a shingle get the sentinel signature
    // (all Long.MaxValue) and would collide in EVERY band — a quadratic
    // false-positive bucket. They carry no content signal; drop them
    // from candidate generation.
    val sigs = docs.select(col("doc_id"),
      minhashSig(col("text"), 3, numHashes, seed).as("sig"))
      .filter(element_at(col("sig"), 1) =!= lit(Long.MaxValue))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("band", "bucket")))
    // Estimate jaccard AT the join (before dedup) so the distinct
    // shuffle carries three scalars per pair instead of two
    // numHashes-long signature arrays.
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
          b => b)).cast("double") / numHashes, 6).as("jaccard_est"))
      .filter(col("jaccard_est") >= threshold)
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  /**
   * SimHash near-dup pairs: 64-bit fingerprint; banding the hash into
   * 8 x 8-bit segments (pigeonhole: hamming <= 7 implies one equal
   * segment); verify with exact Hamming distance.
   */
  def simhashDedup(docs: DataFrame, maxHamming: Int = 7, seed: Long = 42L): DataFrame = {
    val fp = docs.select(col("doc_id"), simhash(col("text"), seed).as("fp"))
    val segmented = fp.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 8).map(s =>
        shiftright(col("fp"), s * 8).bitwiseAND(lit(0xffL))): _*))
        .as(Seq("seg", "segval")))
    // Hamming (xor+popcount on two longs) is far cheaper than the
    // distinct shuffle, so filter candidates BEFORE deduplicating:
    // random 8-bit segments over N docs yield O(N^2/256) candidate
    // pairs, of which only the true near-dups survive the filter.
    segmented.as("a")
      .join(segmented.as("b"),
        col("a.seg") === col("b.seg") && col("a.segval") === col("b.segval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming64(col("a.fp"), col("b.fp")).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  /**
   * Word n-gram Jaccard similarity on pairs blocked by `source`
   * (block key at 100 TB would be an LSH band; the blocked join keeps
   * verification quadratic only within blocks).
   */
  def ngramJaccard(docs: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // Inverted-index formulation: explode distinct shingle hashes
    // (one-pass native expression — tokenize + hash + dedup per row),
    // count co-occurrences per pair (= intersection size) with one
    // shuffle on the shingle hash, then derive Jaccard from per-doc
    // set sizes. Never materializes the quadratic pair space — only
    // pairs actually sharing a shingle appear; the shuffle payload is
    // fixed-width longs, not strings.
    val shingled = docs.select(col("doc_id"), col("source"),
      shingleHashes(col("text"), n).as("sh"))
    val inverted = shingled.select(col("doc_id"), col("source"),
      size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("source"), col("n_sh"),
        xxhash64(col("source"), col("shingle")).as("sh_hash"))
    val inter = inverted.as("a")
      .join(inverted.as("b"),
        col("a.sh_hash") === col("b.sh_hash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  /** Word n-gram shingle strings of a token array. */
  def shingleStrings(toks: Column, n: Int): Column = {
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * Embedding-cosine near-dup pairs, blocked by `label` (at 100 TB the
   * block key is an LSH bucket from `lshBuckets`; the join shape is
   * identical).
   */
  def embeddingNearDup(emb: DataFrame, threshold: Double = 0.3): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"), col("embedding"))
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosineSim(col("a.embedding"), col("b.embedding")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("vec_a").asc, col("vec_b").asc)
  }
}
