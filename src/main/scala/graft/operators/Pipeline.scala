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
   * Deterministic domain-mix sampling: each source (domain) keeps a
   * configured fraction of its documents — the rebalancing step that
   * turns a raw crawl into a training mixture. Like sampleSplit, the
   * keep decision is a pure function of (doc_id, seed) against a
   * 10000-bucket grid, so the sample is reproducible, stable under
   * corpus growth, and map-only at any scale (no per-source counts, no
   * RNG state, no shuffle).
   */
  /**
   * Exact per-source quota sampling: keep exactly min(quota, |source|)
   * documents per source, chosen by the deterministic (doc_id, seed)
   * hash order — "exactly 100k docs per domain" with reproducible
   * membership, vs [[mixSample]]'s rate-based thinning (which hits the
   * quota only in expectation). One window shuffle on source — the
   * same range-partitioned shape as shardPack; the rank order is the
   * splitmix64 hash with doc_id tie-break, so membership is a pure
   * function of (corpus, seed). Unlike rate sampling, an exact quota
   * is inherently whole-source-dependent: adding a document can
   * displace the boundary member — that is the semantics a hard
   * token/doc budget asks for.
   */
  def mixSampleExact(docs: DataFrame, quotas: Map[String, Int],
                     defaultQuota: Int = Int.MaxValue, seed: Long = 42L): DataFrame = {
    require(quotas.values.forall(_ >= 0) && defaultQuota >= 0, "quotas must be >= 0")
    val quotaCol = quotas.foldLeft(lit(defaultQuota)) {
      case (acc, (src, q)) => when(col("source") === src, lit(q)).otherwise(acc)
    }
    val rk = shiftrightunsigned(mix64(col("doc_id") + lit(seed)), 1)
    val w = Window.partitionBy(col("source")).orderBy(rk.asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source"))
      .withColumn("sample_rank", row_number().over(w))
      .withColumn("kept", col("sample_rank") <= quotaCol)
      .orderBy(col("doc_id").asc)
  }

  def mixSample(docs: DataFrame, rates: Map[String, Double],
                defaultRate: Double = 1.0, seed: Long = 42L): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0) &&
      defaultRate >= 0.0 && defaultRate <= 1.0,
      "sampling rates must be in [0, 1]")
    // Rates quantize to 1/10000 so the threshold compare is integral
    // (no float-boundary divergence across engines).
    val rateCol = rates.foldLeft(lit((defaultRate * 10000).round.toInt)) {
      case (acc, (src, r)) =>
        when(col("source") === src, lit((r * 10000).round.toInt)).otherwise(acc)
    }
    val bucket = (shiftrightunsigned(mix64(col("doc_id") + lit(seed)), 1) % 10000)
      .cast("int")
    docs.select(col("doc_id"), col("source"), bucket.as("bucket"),
      rateCol.as("rate_bp"))
      .withColumn("kept", col("bucket") < col("rate_bp"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Benchmark decontamination: for every training document, the
   * fraction of its distinct token n-grams that appear anywhere in
   * the evaluation corpus (the standard containment test run before
   * training to catch test-set leakage).
   *
   * Scale shape: the eval side is a benchmark — orders of magnitude
   * smaller than the training corpus — so its distinct n-gram set
   * broadcasts and the training side stays map-local until one
   * per-doc count aggregation; the 100 TB corpus is never shuffled
   * by n-gram. Docs shorter than `n` tokens have no n-grams and score
   * 0.0 (no signal, nothing to leak).
   */
  def contamination(train: DataFrame, evalDocs: DataFrame, n: Int = 8,
                    threshold: Double = 0.1): DataFrame = {
    // Guard the sequence: Spark generates DESCENDING for sequence(0, -1),
    // so short docs must yield an empty array, not a reversed range.
    def grams(d: DataFrame) = d
      .select(col("doc_id"), tokensOf(col("text")).as("toks"))
      .select(col("doc_id"), explode(
        when(size(col("toks")) >= n,
          array_distinct(transform(sequence(lit(0), size(col("toks")) - n),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))))
          .otherwise(array().cast("array<string>"))).as("ngram"))
    val evalGrams = grams(evalDocs).select(col("ngram")).distinct()
    val counted = grams(train)
      .join(broadcast(evalGrams.withColumn("hit", lit(1))), Seq("ngram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"), count(col("hit")).as("n_contaminated"))
    train.select(col("doc_id"))
      .join(counted, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated") / col("n_ngrams"), lit(0.0)), 6)
          .as("contamination"))
      .withColumn("is_contaminated", col("contamination") > threshold)
      .orderBy(col("doc_id").asc)
  }

  /**
   * Corpus cleaning: the composed filter every training pipeline runs
   * before tokenization — exact dedup, length, language, and quality
   * gates in one pass, each document labeled keep/reject with the
   * FIRST failing rule as the reason (fixed rule order is part of the
   * cross-engine contract). One shuffle total: the min-doc_id
   * representative window on the content hash; every other gate is
   * map-side arithmetic over the one-pass TextStats struct.
   */
  def cleanCorpus(docs: DataFrame, minTokens: Int = 10,
                  minQuality: Double = 0.3, langThreshold: Double = 0.05): DataFrame = {
    val gates = cleanGates(docs, minTokens, minQuality, langThreshold)
      .withColumn("rep", min(col("doc_id"))
        .over(Window.partitionBy(col("content_hash"))))
    val reason = when(col("doc_id") =!= col("rep"), "duplicate")
      .otherwise(col("pre_reason"))
    gates.select(col("doc_id"), reason.as("reason"),
      (reason === "ok").as("keep"), col("quality_score"))
      .orderBy(col("doc_id").asc)
  }

  /** Stateless half of the cleaning gates (everything except the
    * duplicate rule, which needs cross-document state): per-doc
    * content hash, first-failing-rule label among too_short /
    * non_english / low_quality, and the quantized quality score.
    * Shared by the batch window path and the streaming twin. */
  private[graft] def cleanGates(docs: DataFrame, minTokens: Int,
                                minQuality: Double, langThreshold: Double): DataFrame = {
    // source is only needed by composed consumers (prepareCorpus);
    // cleanCorpus's own contract never required it, so default it.
    val srcCol =
      if (docs.columns.contains("source")) col("source") else lit("").as("source")
    val st = docs.select(col("doc_id"), srcCol,
      textStats(col("text")).as("st"),
      md5(col("text")).as("content_hash"))
    val nTok = col("st.n_tokens").cast("double")
    val stopRatio = when(nTok > 0, col("st.stop_hits").cast("double") / nTok)
      .otherwise(lit(0.0))
    val avgLen = when(nTok > 0, col("st.total_token_chars").cast("double") / nTok)
      .otherwise(lit(0.0))
    val quality = lit(0.4) * stopRatio +
      lit(0.3) * least(lit(1.0), nTok / lit(200.0)) +
      lit(0.3) * greatest(lit(0.0), lit(1.0) - abs(avgLen - lit(5.0)) / lit(10.0))
    val preReason = when(col("st.n_tokens") < minTokens, "too_short")
      .when(stopRatio < langThreshold, "non_english")
      .when(quality < minQuality, "low_quality")
      .otherwise("ok")
    // source and n_tokens ride along so composed consumers
    // (prepareCorpus, the streaming twin) get them from this one
    // tokenize pass instead of re-deriving and re-joining.
    st.select(col("doc_id"), col("source"), col("st.n_tokens").as("n_tokens"),
      col("content_hash"), preReason.as("pre_reason"),
      graft.operators.TextAnalysis.quant6(quality).as("quality_score"))
  }

  /**
   * The full preprocessing DAG in one call — raw documents to
   * training disposition: cleaning gates (duplicate / too_short /
   * non_english / low_quality), deterministic split assignment for
   * survivors, token-budget shard packing for the kept train docs.
   * One content-hash window (the dedup rule), one doc_id join, one
   * (source)-partitioned packing window whose cumulative sum MASKS
   * non-train rows — rejected and val/test docs contribute zero, so
   * the packing needs no second pass and no re-join. Output: one row
   * per doc with reason, keep, split (null when dropped), shard_idx
   * (null unless a kept train doc).
   */
  def prepareCorpus(docs: DataFrame, minTokens: Int = 10, minQuality: Double = 0.3,
                    langThreshold: Double = 0.05, trainPct: Int = 80, valPct: Int = 10,
                    seed: Long = 42L, budgetTokens: Int = 4096): DataFrame = {
    // cleanGates carries source + n_tokens from its single tokenize
    // pass, so the whole DAG needs no second textStats and no doc_id
    // re-join — the dedup rule below is the same window cleanCorpus
    // applies.
    val labeled = cleanGates(docs, minTokens, minQuality, langThreshold)
      .withColumn("rep", min(col("doc_id"))
        .over(Window.partitionBy(col("content_hash"))))
    val reason = when(col("doc_id") =!= col("rep"), "duplicate")
      .otherwise(col("pre_reason"))
    val bucket = (shiftrightunsigned(mix64(col("doc_id") + lit(seed)), 1) % 100)
      .cast("int")
    val split = when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val").otherwise("test")
    val base = labeled.select(col("doc_id"), col("source"), col("n_tokens"),
        reason.as("reason"), (reason === "ok").as("keep"))
      .withColumn("split", when(col("keep"), split).otherwise(lit(null).cast("string")))
    val isTrain = col("split") === "train"
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(when(isTrain, col("n_tokens")).otherwise(lit(0))).over(w)
    base.withColumn("shard_idx",
        when(isTrain, ((cum - col("n_tokens")) / budgetTokens).cast("int"))
          .otherwise(lit(null).cast("int")))
      .select(col("doc_id"), col("source"), col("reason"), col("keep"),
        col("split"), col("shard_idx"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Cross-source n-gram containment matrix (a dataset-card
   * diagnostic: which sources replicate each other's content): for
   * each ordered source pair (a, b) sharing at least one distinct
   * token n-gram, the fraction of a's distinct n-grams also present
   * in b. Shapes: one distinct aggregate to (source, ngram) rows,
   * then the gram-keyed self-join — the inverted-index shape; the
   * pair space is per-gram source lists, never doc pairs — then one
   * count per source pair. Zero-overlap pairs are omitted (the matrix
   * is sparse by construction). Unlike doc-level dedup, the per-gram
   * fan-out here is bounded by the SOURCE count squared (sources are
   * tens, not billions), so boilerplate grams cannot explode the join
   * — no frequency cap needed at any corpus size.
   */
  def sourceOverlap(docs: DataFrame, n: Int = 8): DataFrame = {
    // Gram identity shuffles as a compact (xxhash64, murmur3) pair —
    // no output column carries a gram string, so the 8-token strings
    // die map-side at generation and the distinct + self-join move
    // 12-byte keys instead.
    val grams = graft.GraftFunctions.scaleScan(docs)
      .select(col("source"), tokensOf(col("text")).as("toks"))
      .select(col("source"), explode(
        when(size(col("toks")) >= n,
          array_distinct(transform(sequence(lit(0), size(col("toks")) - n),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))))
          .otherwise(array().cast("array<string>"))).as("ngram"))
      .select(col("source"), xxhash64(col("ngram")).as("g1"), hash(col("ngram")).as("g2"))
      .distinct()
      // three consumers (both join sides + counts): pin the distinct
      // gram set so the tokenize/explode pass runs once. pin defaults
      // to DISK_ONLY persist — recomputable lineage, not the
      // no-fallback block pinning of localCheckpoint.
      .transform(graft.GraftFunctions.pin)
    val counts = grams.groupBy(col("source")).agg(count(lit(1)).as("grams_a"))
    grams.as("a").join(grams.as("b"),
        col("a.g1") === col("b.g1") && col("a.g2") === col("b.g2") &&
          col("a.source") =!= col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .join(counts.withColumnRenamed("source", "source_a"), Seq("source_a"))
      .select(col("source_a"), col("source_b"), col("grams_a"), col("shared_grams"),
        round(col("shared_grams") / col("grams_a"), 6).as("containment"))
      .orderBy(col("source_a").asc, col("source_b").asc)
  }

  /**
   * PII scrubbing gate: detect and redact the four machine-matchable
   * PII shapes a corpus pipeline strips before training — URLs,
   * email addresses, IPv4 addresses, and phone-shaped digit runs.
   * Counts are measured on the ORIGINAL text (each pattern
   * independently); redaction applies the patterns in order
   * (url → email → ip → phone) so a longer match swallows its
   * substrings before the narrower patterns run. Map-side only: one
   * regex pass per pattern inside whole-stage codegen, no shuffle at
   * any scale. Patterns restrict to syntax Java regex and RE2 agree
   * on (classes, \\d, \\b, bounded repetition) so the DuckDB oracle
   * replays them byte-identically.
   */
  def piiScrub(docs: DataFrame, textCol: String = "text",
               ordered: Boolean = true): DataFrame = {
    val t = col(textCol)
    val redacted = PII_PATTERNS.foldLeft(t) { case (acc, (pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }
    val out = docs.select(Seq(col("doc_id")) ++
      PII_PATTERNS.map { case (pat, tag) =>
        val name = tag.stripPrefix("<").stripSuffix(">").toLowerCase
        regexp_count(t, lit(pat)).cast("int").as(s"n_$name")
      } ++ Seq(redacted.as("redacted")): _*)
      .withColumn("pii_total",
        col("n_url") + col("n_email") + col("n_ip") + col("n_phone"))
    // ordered=false keeps the op map-only end to end — usable directly
    // on a stream (global sorts are unsupported in append mode) and
    // the shape a 100 TB batch pipeline wants anyway.
    if (ordered) out.orderBy(col("doc_id").asc) else out
  }

  /** (pattern, redaction tag) in application order. Case-insensitive
    * where case can appear (schemes, mailbox/domain chars), and URL
    * matches stop at ANY whitespace, not just the space character —
    * both still inside the Java/RE2 common subset the oracle needs. */
  val PII_PATTERNS: Seq[(String, String)] = Seq(
    "(?i)https?://[^\\s]+" -> "<URL>",
    "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}-\\d{4}\\b" -> "<PHONE>")

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

  /**
   * Shard manifest — the reproducibility artifact a training run
   * records next to its data: per (source, shard) document count,
   * token total, and an ORDER-INDEPENDENT membership checksum (XOR
   * fold of each member id's splitmix64, sign bit cleared) —
   * re-derive the manifest later and equal hashes prove the shard
   * contains exactly the same documents, regardless of task order or
   * cluster layout. XOR rather than a wide-decimal sum: it is
   * overflow-free at ANY shard size (an unbounded DECIMAL sum returns
   * NULL on overflow with ANSI mode off — a silently-degrading
   * reproducibility artifact), and self-cancellation cannot fire
   * because each document appears exactly once per shard by
   * construction. One roll-up over shardPack's window pass.
   */
  def shardManifest(docs: DataFrame, budgetTokens: Int = 4096,
                    seed: Long = 42L): DataFrame = {
    shardPack(docs, budgetTokens)
      .withColumn("__dh",
        shiftrightunsigned(mix64(col("doc_id") + lit(seed)), 1))
      .groupBy(col("source"), col("shard_idx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        expr("CAST(bit_xor(__dh) AS STRING)").as("manifest_hash"))
      .orderBy(col("source").asc, col("shard_idx").asc)
  }

  /**
   * Concat-and-chunk sequence packing: within each source, documents
   * (in doc_id order) concatenate into one token stream carved into
   * fixed `seqLen`-token training sequences — the pretraining data
   * layout, where a document may SPAN sequence boundaries (unlike
   * [[shardPack]], which assigns whole documents to budget shards).
   * Per document: its token offset in the stream, the first and last
   * sequence it lands in, and how many sequences it touches —
   * everything a loader needs to slice examples. Same scale shape as
   * shardPack: sources pack independently in parallel, one window
   * over a source-partitioned exchange, integer-exact arithmetic
   * (`div`) end to end.
   */
  def packSequences(docs: DataFrame, seqLen: Int = 2048): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"),
      textStats(col("text")).getField("n_tokens").cast("long").as("n_tokens"))
      .withColumn("tok_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_first",
        when(col("n_tokens") > 0, expr(s"tok_start div $seqLen")))
      .withColumn("seq_last",
        when(col("n_tokens") > 0,
          expr(s"(tok_start + n_tokens - 1) div $seqLen")))
      .withColumn("n_seqs",
        coalesce(col("seq_last") - col("seq_first") + 1, lit(0L)))
      .orderBy(col("doc_id").asc)
  }
}
