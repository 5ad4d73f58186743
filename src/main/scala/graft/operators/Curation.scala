package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraftFunctions._

/**
 * Corpus-curation gates beyond the basic cleaning pass: the
 * Gopher-style repetition/format rules (Rae et al. 2021, public
 * arXiv:2112.11446 Appendix A), temperature-scaled source mixing
 * (the multilingual/multi-source sampling rule of arXiv:1901.07291),
 * and snapshot diffing for incremental crawls.
 *
 * All three are map-side-dominant: gopherQuality is one pass per
 * document (no shuffle at all), mixTemperature is one tiny
 * per-source aggregate + a map-side hash gate, corpusDiff is a
 * single id-keyed full outer join.
 */
object Curation {

  /**
   * Linear quality classifier — the CCNet/GPT-3-style "model-based
   * quality filter" tier above the rule gates: a fixed-coefficient
   * linear model over one-pass document features produces a
   * continuous quality logit, and keep/reject is the sign of the
   * logit (exactly the decision boundary a logistic classifier
   * draws; the monotone sigmoid is omitted so every emitted number
   * is rational arithmetic, exactly replayable cross-engine — no
   * exp() ulp drift in the oracle contract). The coefficient vector
   * is a transparent stand-in with the same plumbing a trained
   * model drops into: swap `weights` for learned values and nothing
   * else changes.
   *
   * Features (all from ONE codegen'd textStats pass + length()):
   * stopword ratio (fluency), unique-token ratio (vocabulary
   * diversity), mean-word-length plausibility, length saturation,
   * and alphanumeric-character density. Map-side only — no shuffle
   * but the presentation sort.
   */
  def qualityClassifier(docs: DataFrame,
                        weights: (Double, Double, Double, Double, Double, Double) =
                          (-2.5, 2.0, 1.0, 1.0, 1.5, 1.0),
                        ordered: Boolean = true): DataFrame = {
    val (b0, w1, w2, w3, w4, w5) = weights
    val st = docs.select(col("doc_id"), textStats(col("text")).as("st"),
      length(col("text")).cast("double").as("n_chars"))
    val nTok = col("st.n_tokens").cast("double")
    val x1 = when(nTok > 0, col("st.stop_hits").cast("double") / nTok).otherwise(lit(0.0))
    val x2 = when(nTok > 0, col("st.n_unique_tokens").cast("double") / nTok).otherwise(lit(0.0))
    val avgLen = when(nTok > 0, col("st.total_token_chars").cast("double") / nTok).otherwise(lit(0.0))
    val x3 = greatest(lit(0.0), lit(1.0) - abs(avgLen - lit(5.0)) / lit(10.0))
    val x4 = least(lit(1.0), nTok / lit(200.0))
    val x5 = when(col("n_chars") > 0,
      col("st.total_token_chars").cast("double") / col("n_chars")).otherwise(lit(0.0))
    val z = lit(b0) + lit(w1) * x1 + lit(w2) * x2 + lit(w3) * x3 +
      lit(w4) * x4 + lit(w5) * x5
    val out = st.select(col("doc_id"),
      graft.operators.TextAnalysis.quant6(x1).as("stop_ratio"),
      graft.operators.TextAnalysis.quant6(x2).as("unique_ratio"),
      graft.operators.TextAnalysis.quant6(x3).as("wordlen_plaus"),
      graft.operators.TextAnalysis.quant6(x4).as("len_sat"),
      graft.operators.TextAnalysis.quant6(x5).as("alnum_density"),
      graft.operators.TextAnalysis.quant6(z).as("quality_logit"),
      (z > 0.0).as("keep"))
    // pure map-side gate: with ordered=false (no presentation sort) the
    // same plan runs unchanged inside a streaming micro-batch — the
    // piiScrub streaming-usability contract
    if (ordered) out.orderBy(col("doc_id").asc) else out
  }

  /**
   * Gopher quality rules, first-failing-rule-wins (same contract as
   * cleanCorpus): word-count bounds, mean-word-length band,
   * symbol-to-word ratio (# and ellipsis), bullet-line and
   * ellipsis-line ratios, alphabetic-token ratio, minimum stopword
   * hits. Thresholds compare on RAW doubles; emitted ratios quantize
   * to 6 dp (the cross-engine contract every text gate here uses).
   *
   * One pass per document: token stats come from the codegen'd
   * textStats expression, the per-token alpha test and per-line
   * format tests are row-local HOFs — nothing shuffles.
   */
  def gopherQuality(docs: DataFrame, minWords: Int = 50, maxWords: Int = 100000,
                    minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                    maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
                    maxEllipsisRatio: Double = 0.3, minAlphaRatio: Double = 0.8,
                    minStopHits: Int = 2): DataFrame = {
    val st = textStats(col("text"))
    val nTok = st.getField("n_tokens").cast("double")
    val meanLen = when(nTok > 0,
      st.getField("total_token_chars").cast("double") / nTok).otherwise(lit(0.0))
    val nAlpha = size(filter(tokensOf(col("text")), t => t.rlike("[a-z]")))
    val alphaRatio = when(nTok > 0, nAlpha.cast("double") / nTok).otherwise(lit(0.0))
    val hashCount = (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
      .cast("double")
    val ellipsisCount =
      ((length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
        .cast("double")
    val symbolRatio = when(nTok > 0, (hashCount + ellipsisCount) / nTok)
      .otherwise(lit(0.0))
    val lines = split(col("text"), "\n")
    val nLines = size(lines).cast("double")
    val bulletRatio = when(nLines > 0,
      size(filter(lines, l => ltrim(l).startsWith("-") || ltrim(l).startsWith("*")))
        .cast("double") / nLines).otherwise(lit(0.0))
    val ellLineRatio = when(nLines > 0,
      size(filter(lines, l => rtrim(l).endsWith("...")))
        .cast("double") / nLines).otherwise(lit(0.0))
    val reason =
      when(st.getField("n_tokens") < minWords || st.getField("n_tokens") > maxWords,
        "word_count")
      .when(meanLen < minMeanLen || meanLen > maxMeanLen, "mean_word_len")
      .when(symbolRatio > maxSymbolRatio, "symbol_ratio")
      .when(bulletRatio > maxBulletRatio, "bullet_lines")
      .when(ellLineRatio > maxEllipsisRatio, "ellipsis_lines")
      .when(alphaRatio < minAlphaRatio, "non_alpha")
      .when(st.getField("stop_hits") < minStopHits, "stopwords")
      .otherwise("ok")
    docs.select(col("doc_id"),
      st.getField("n_tokens").as("n_tokens"),
      TextAnalysis.quant6(meanLen).as("mean_word_len"),
      TextAnalysis.quant6(symbolRatio).as("symbol_ratio"),
      TextAnalysis.quant6(alphaRatio).as("alpha_ratio"),
      st.getField("stop_hits").as("stop_hits"),
      reason.as("reason"), (reason === "ok").as("keep"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Temperature-scaled source mixing: sampling rates follow
   * w_s = n_s^T / sum(n_s^T) (T < 1 upweights small sources), and
   * each source keeps min(1, target * w_s / n_s) of its documents
   * via the same splitmix64 bucket gate mixSample uses.
   *
   * The per-source counts are a tiny aggregate (source cardinality
   * rows) collected to the driver; the rates are FITTED PARAMETERS
   * exactly like k-means centroids — computed once, broadcast as
   * literals, stashed for the oracle. Membership is then a pure
   * map-side function of (doc_id, seed), so the gate replays
   * bit-for-bit cross-engine; the driver never touches corpus rows.
   */
  def mixTemperature(docs: DataFrame, temperature: Double = 0.7,
                     targetFraction: Double = 0.5,
                     seed: Long = 42L): (Map[String, Int], DataFrame) = {
    require(temperature > 0 && targetFraction > 0 && targetFraction <= 1,
      "temperature and targetFraction must be positive (fraction <= 1)")
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val total = counts.values.sum.toDouble
    val wSum = counts.values.map(n => math.pow(n.toDouble, temperature)).sum
    val rates = counts.map { case (s, n) =>
      val w = math.pow(n.toDouble, temperature) / wSum
      val rate = math.min(1.0, targetFraction * total * w / n.toDouble)
      (s, (rate * 10000).round.toInt)
    }
    val rateCol = rates.foldLeft(lit(0)) { case (acc, (src, bp)) =>
      when(col("source") === src, lit(bp)).otherwise(acc)
    }
    val bucket = (shiftrightunsigned(mix64(col("doc_id") + lit(seed)), 1) % 10000)
      .cast("int")
    (rates,
      docs.select(col("doc_id"), col("source"), bucket.as("bucket"),
        rateCol.as("rate_bp"))
        .withColumn("kept", col("bucket") < col("rate_bp"))
        .orderBy(col("doc_id").asc))
  }

  /**
   * Snapshot diff for incremental corpus maintenance: one row per
   * doc_id present in either snapshot, labeled added / removed /
   * changed / unchanged by a content-hash compare. A single
   * id-partitioned full outer join — both sides shuffle once on the
   * uniform doc_id key (AQE-safe, no skew), content compared as a
   * fixed-width md5, never as text.
   */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("old_hash"))
    val n = newDocs.select(col("doc_id"), md5(col("text")).as("new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged").as("status"))
      .orderBy(col("doc_id").asc)
  }
}
