package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis operators for training-data pipelines
 * (SURVEY.md paragraph 2 E): token counting, quality scoring, heuristic
 * language ID, content fingerprinting, and fixed-window chunking (the
 * Spark twin of the reference's document -> chunk flow,
 * /root/reference/services/chunk_service.py:17-55).
 *
 * Every function is pure column algebra (codegen'd built-ins), so at
 * 100 TB these run map-side in the scan stage with zero shuffle.
 */
object TextAnalysis {

  def tokens(c: Column): Column = Dedup.tokens(c)

  /** Small fixed english stopword list (shared with the DuckDB oracle). */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is",
    "on", "for", "with", "as", "at", "by", "an", "be", "this", "that", "it", "or")

  /** Token statistics per document. */
  def tokenStats(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"),
      size(tokens(col("text"))).as("n_tokens"),
      size(array_distinct(tokens(col("text")))).as("n_unique_tokens"),
      length(col("text")).cast("int").as("n_chars"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Quality score in [0,1]: blend of stopword ratio (fluency proxy),
   * length saturation, and mean-word-length plausibility. Per-row
   * double arithmetic only — deterministic across engines.
   */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopArr = array(stopwordsEn.map(lit): _*)
    val stopHits = size(filter(toks, t => array_contains(stopArr, t))).cast("double")
    val totalLen = aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
    val stopRatio = when(nTok > 0, stopHits / nTok).otherwise(lit(0.0))
    val avgLen = when(nTok > 0, totalLen / nTok).otherwise(lit(0.0))
    val lenSat = least(lit(1.0), nTok / lit(200.0))
    val wordPlaus = greatest(lit(0.0), lit(1.0) - abs(avgLen - lit(5.0)) / lit(10.0))
    docs.select(col("doc_id"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(avgLen, 6).as("avg_token_len"),
      round(lit(0.4) * stopRatio + lit(0.3) * lenSat + lit(0.3) * wordPlaus, 6)
        .as("quality_score"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Heuristic language ID: english stopword density over tokens.
   * (An n-gram profile model plugs into the same shape; the testdata
   * corpus is synthetic english-like text.)
   */
  def langId(docs: DataFrame, threshold: Double = 0.05): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopArr = array(stopwordsEn.map(lit): _*)
    val ratio = when(nTok > 0,
      size(filter(toks, t => array_contains(stopArr, t))).cast("double") / nTok)
      .otherwise(lit(0.0))
    docs.select(col("doc_id"),
      round(ratio, 6).as("stopword_ratio"),
      when(ratio >= threshold, "en").otherwise("und").as("pred_lang"))
      .orderBy(col("doc_id").asc)
  }

  /** Normalized-content fingerprint (whitespace-collapsed, lowercased). */
  def contentFingerprint(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fingerprint"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Fixed-window word chunking: document -> (doc_id, chunk_idx, chunk
   * text, token count). The reference chunks per sentence
   * (sentence_number); window chunking is the batch-pipeline twin.
   */
  def chunkWords(docs: DataFrame, window: Int = 32): DataFrame = {
    val toks = tokens(col("text"))
    val nChunks = floor((size(toks) + window - 1) / window).cast("int")
    docs.select(col("doc_id"), col("source"),
      posexplode(
        when(size(toks) > 0,
          transform(sequence(lit(0), nChunks - 1),
            i => concat_ws(" ", slice(toks, i * window + 1, lit(window)))))
          .otherwise(array().cast("array<string>")))
        .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens", size(tokens(col("chunk_text"))))
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)
  }

  /** Per-source corpus statistics over chunks (reference get_chunk_stats). */
  def chunkStats(docs: DataFrame, window: Int = 32): DataFrame = {
    chunkWords(docs, window)
      .groupBy(col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("n_tokens")), 6).as("avg_chunk_tokens"))
      .orderBy(col("source").asc)
  }
}
