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
  import graft.GraftFunctions.textStats

  def tokens(c: Column): Column = Dedup.tokens(c)

  /**
   * Cross-engine-stable 6-decimal quantization for ratio-derived
   * scores. Ratios of small integers regularly produce values that are
   * EXACT 7-digit decimals (e.g. 0.3820625) whose nearest double sits
   * one ulp below the decimal half-boundary; engines then disagree on
   * round() depending on whether they round the double's shortest
   * string (Spark: down) or scale-by-1e6 in floats (DuckDB: up). This
   * identical IEEE expression — floor(x*1e6 + 0.5)/1e6 — evaluates
   * bit-equally everywhere. (Full-entropy doubles like cosines never
   * sit at the boundary; plain round stays fine for those.)
   */
  def quant6(c: Column): Column = floor(c * lit(1.0e6) + lit(0.5)) / lit(1.0e6)

  /** Small fixed english stopword list (shared with the DuckDB oracle). */
  val stopwordsEn: Seq[String] = graft.GraftFunctions.stopwordsEn

  // All per-document measures derive from the one-pass TextStats native
  // expression — one tokenizer run per row, fully codegen'd. The HOF
  // formulation (filter/aggregate over split()) re-evaluates the
  // tokenizer per lambda reference and falls out of whole-stage codegen.

  /** Token statistics per document. */
  /**
   * Token-distribution entropy per document (nats): low entropy =
   * degenerate/repetitive vocabulary, a quality signal complementary
   * to n-gram repetition. Two narrow shuffles on compact keys
   * ((doc_id, token) counts, then per-doc fold) — the token text
   * never rides a wide row.
   */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("doc_id"), explode(graft.GraftFunctions.tokensOf(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val perDoc = counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clogc"))
      // H = ln(n) - (1/n) * sum(c * ln c) — one pass, no per-token p
      .select(col("doc_id"), col("n"), col("n_distinct"),
        quant6(log(col("n").cast("double")) - col("clogc") / col("n")).as("entropy"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("entropy"), lit(0.0)).as("entropy"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Intra-document repetition: 1 - distinct/total token n-grams — the
   * standard boilerplate/degenerate-text gate (a doc that repeats the
   * same phrase scores near 1). Map-side only; docs shorter than `n`
   * tokens have no n-grams and score 0.
   */
  def repetition(docs: DataFrame, n: Int = 3): DataFrame = {
    val grams = when(size(col("toks")) >= n,
      transform(sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), graft.GraftFunctions.tokensOf(col("text")).as("toks"))
      .select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"), size(col("grams")).as("n_ngrams"),
        size(array_distinct(col("grams"))).as("n_distinct"))
      .withColumn("repetition", quant6(
        when(col("n_ngrams") > 0,
          lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams"))
          .otherwise(lit(0.0))))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Per-source corpus report: doc counts, token totals, and
   * interpolated token-count percentiles — the dataset card every
   * training mixture ships with. One partial-aggregated pass; the
   * percentile aggregate shuffles per-source sorted buffers, fine for
   * the group count (sources are domains, not documents); at true
   * 100 TB per-source volume set `spark.graft.percentiles=approx`
   * (GraftFunctions.percentileAgg) for the bounded-memory t-digest.
   */
  def corpusStats(docs: DataFrame): DataFrame = {
    val pctl = (c: String, p: Double) =>
      graft.GraftFunctions.percentileAgg(docs.sparkSession, c, p)
    docs.select(col("source"),
      textStats(col("text")).getField("n_tokens").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        quant6(avg(col("nt"))).as("mean_tokens"),
        quant6(pctl("nt", 0.5)).as("p50_tokens"),
        quant6(pctl("nt", 0.9)).as("p90_tokens"),
        quant6(pctl("nt", 0.99)).as("p99_tokens"))
      .orderBy(col("source").asc)
  }

  def tokenStats(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"), textStats(col("text")).as("st"),
      length(col("text")).cast("int").as("n_chars"))
      .select(col("doc_id"),
        col("st.n_tokens").as("n_tokens"),
        col("st.n_unique_tokens").as("n_unique_tokens"),
        col("n_chars"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Quality score in [0,1]: blend of stopword ratio (fluency proxy),
   * length saturation, and mean-word-length plausibility. Per-row
   * double arithmetic only — deterministic across engines.
   */
  def qualityScore(docs: DataFrame): DataFrame = {
    val st = docs.select(col("doc_id"), textStats(col("text")).as("st"))
    val nTok = col("st.n_tokens").cast("double")
    val stopRatio = when(nTok > 0, col("st.stop_hits").cast("double") / nTok).otherwise(lit(0.0))
    val avgLen = when(nTok > 0, col("st.total_token_chars").cast("double") / nTok).otherwise(lit(0.0))
    val lenSat = least(lit(1.0), nTok / lit(200.0))
    val wordPlaus = greatest(lit(0.0), lit(1.0) - abs(avgLen - lit(5.0)) / lit(10.0))
    st.select(col("doc_id"),
      quant6(stopRatio).as("stopword_ratio"),
      quant6(avgLen).as("avg_token_len"),
      quant6(lit(0.4) * stopRatio + lit(0.3) * lenSat + lit(0.3) * wordPlaus)
        .as("quality_score"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Heuristic language ID: english stopword density over tokens.
   * (An n-gram profile model plugs into the same shape; the testdata
   * corpus is synthetic english-like text.)
   */
  def langId(docs: DataFrame, threshold: Double = 0.05): DataFrame = {
    val st = docs.select(col("doc_id"), textStats(col("text")).as("st"))
    val nTok = col("st.n_tokens").cast("double")
    val ratio = when(nTok > 0, col("st.stop_hits").cast("double") / nTok).otherwise(lit(0.0))
    st.select(col("doc_id"),
      quant6(ratio).as("stopword_ratio"),
      when(ratio >= threshold, "en").otherwise("und").as("pred_lang"))
      .orderBy(col("doc_id").asc)
  }

  /** Stopword profiles for the multi-language classifier. ASCII-only by
    * construction: the tokenizer alphabet is [a-z0-9], so accented
    * function words (für, è, à) can never appear as tokens and are
    * omitted from the profiles. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> stopwordsEn,
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
      "es", "por", "con", "para", "su", "se", "no", "al", "lo", "como"),
    "fr" -> Seq("le", "la", "les", "des", "un", "une", "et", "est", "que",
      "pour", "dans", "qui", "pas", "sur", "avec", "ne", "ce", "il", "au", "du"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "zu", "von", "mit", "den", "auf", "dem", "sich", "des", "im", "dass",
      "auch", "wird"),
    "it" -> Seq("il", "la", "le", "di", "che", "e", "un", "una", "per",
      "con", "non", "sono", "del", "si", "da", "in", "al", "dei", "nel", "alla"))

  /**
   * Multi-language heuristic language ID: per-language stopword density
   * (hits / tokens) over the profiles above; prediction = the first
   * language in profile order whose density is >= `threshold` and >=
   * every other language's density ("argmax with priority tie-break").
   * One tokenizer pass per row: a single termFreqs call over the
   * concatenated profiles, per-language hits summed from slices of the
   * materialized count array — map-side only, codegen-friendly.
   */
  def langIdMulti(docs: DataFrame, threshold: Double = 0.05): DataFrame = {
    import graft.GraftFunctions.termFreqs
    val allTerms = langProfiles.flatMap(_._2)
    val starts = langProfiles.map(_._2.length).scanLeft(0)(_ + _)
    val langs = langProfiles.map(_._1)

    val base = docs.select(col("doc_id"), textStats(col("text")).as("st"),
      termFreqs(col("text"), allTerms).as("tf"))
    val hits = base.select(Seq(col("doc_id"), col("st")) ++
      langProfiles.zipWithIndex.map { case ((l, ws), i) =>
        aggregate(slice(col("tf.tfs"), starts(i) + 1, ws.length),
          lit(0), _ + _).as(s"h_$l")
      }: _*)
    val nTok = col("st.n_tokens").cast("double")
    val ratios = hits.select(col("doc_id") +: langs.map { l =>
      when(nTok > 0, col(s"h_$l").cast("double") / nTok)
        .otherwise(lit(0.0)).as(s"r_$l")
    }: _*)
    // Prediction compares RAW ratios (bit-identical cross-engine: one
    // IEEE division of integer-valued doubles); only the OUTPUT ratios
    // are quantized.
    val pred = langs.map { l =>
      (col(s"r_$l") >= lit(threshold)) &&
        langs.filterNot(_ == l).map(m => col(s"r_$l") >= col(s"r_$m")).reduce(_ && _)
    }.zip(langs).foldRight(lit("und")) { case ((c, l), acc) => when(c, lit(l)).otherwise(acc) }
    ratios.select(col("doc_id") +: langs.map(l => quant6(col(s"r_$l")).as(s"r_$l"))
        :+ pred.as("pred_lang"): _*)
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
  def chunkWords(docs: DataFrame, window: Int = 32): DataFrame =
    chunksUnordered(docs, window)
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)

  /**
   * chunkWords without the presentation sort (for downstream aggs).
   * Tokenizes once into an attribute, explodes chunk indices, then
   * slices — the token array is never re-derived per chunk.
   */
  def chunksUnordered(docs: DataFrame, window: Int = 32): DataFrame = {
    val toked = docs.select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
    toked
      .select(col("doc_id"), col("source"), col("toks"),
        explode(when(size(col("toks")) > 0,
          sequence(lit(0), floor((size(col("toks")) + window - 1) / window).cast("int") - 1))
          .otherwise(array().cast("array<int>"))).as("chunk_idx"))
      .select(col("doc_id"), col("source"), col("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("chunk_idx") * window + 1, lit(window)))
          .as("chunk_text"),
        least(lit(window), size(col("toks")) - col("chunk_idx") * window).as("n_tokens"))
  }

  /**
   * Document-level pooled embedding: mean-pool the per-chunk
   * embeddings into one vector per document — the standard
   * chunk-to-document aggregation every retrieval/clustering pipeline
   * runs when the unit of interest is the document but the embedder's
   * context window forces chunking. Emitted EXPLODED (doc_id, pos,
   * pool_val) — never an array column (oracle comparator contract).
   *
   * Cross-engine float discipline (the embedding_drift rule): each
   * chunk component quantizes to 6 dp and sums as DECIMAL — exact and
   * order-independent, so Spark's nondeterministic aggregation order
   * cannot produce a different mean than the oracle's. One explode +
   * one (doc_id, pos) shuffle with map-side partials; documents with
   * no tokens have no chunks and are absent, matching the chunker.
   */
  def docPooledEmbedding(docs: DataFrame, window: Int = 32,
                         dim: Int = 64): DataFrame = {
    import graft.GraftFunctions.embedText
    // scaleScan: the chunk+embed kernel is the dominant cost of the
    // pool build (and of doc_knn's audit-form re-pool) — it must not
    // serialize on a 1-split scan (guide §2.5)
    chunksUnordered(graft.GraftFunctions.scaleScan(docs), window)
      .select(col("doc_id"),
        posexplode(embedText(col("chunk_text"), dim)).as(Seq("pos", "x")))
      // quant6 (floor-form) rather than round(): a chunk component can
      // land on a .xxxxxx5 half-boundary where BigDecimal half-up and
      // the oracle's binary ROUND disagree by 1 ulp; the floor form is
      // identical double arithmetic on both engines
      .withColumn("x6", quant6(col("x").cast("double")).cast("decimal(28,6)"))
      .groupBy(col("doc_id"), col("pos"))
      .agg(count(lit(1)).as("n_chunks"),
        quant6(sum(col("x6")).cast("double") / count(lit(1))).as("pool_val"))
      .orderBy(col("doc_id").asc, col("pos").asc)
  }

  /**
   * Document-level k-NN over the POOLED vectors (the retrieval mode
   * where the unit of interest is the whole document): score =
   * cosine(query, mean-pooled doc vector), computed ENTIRELY in the
   * exploded (doc_id, pos, pool_val) form — no array rebuild, no
   * collect_list; the query rides as a broadcast 64-row (pos, qv)
   * side. Cross-engine float discipline: pool_val is 6-dp exact, so
   * pool_val^2 is 12-dp EXACT and sums as DECIMAL without loss; the
   * pool*query products quantize to 12 dp (floor form) before their
   * DECIMAL sum — both engines fold identical decimals, so Spark's
   * aggregation order cannot shift the score.
   */
  def docKnn(docs: DataFrame, qvec: Array[Double], window: Int = 32,
             dim: Int = 64, k: Int = 10): DataFrame = {
    require(qvec.length == dim, s"query dim ${qvec.length} != $dim")
    docKnnPooled(docPooledEmbedding(docs, window, dim), qvec, k)
  }

  /** The serving form of [[docKnn]]: score a PRE-MATERIALIZED pooled
    * table (doc_pool persisted once at ingest, like every other index
    * here) — per-query cost is then one scan of ndocs*dim exploded
    * rows + one doc_id roll-up, not the chunk-level re-pool. */
  def docKnnPooled(pooled: DataFrame, qvec: Array[Double], k: Int = 10): DataFrame = {
    val spark = pooled.sparkSession
    import spark.implicits._
    def quant12(c: Column): Column =
      floor(c * lit(1.0e12) + lit(0.5)) / lit(1.0e12)
    val q = qvec.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("pos", "qv")
    val qnorm = {
      var acc = 0.0; var i = 0
      while (i < qvec.length) { acc += qvec(i) * qvec(i); i += 1 }
      math.sqrt(acc)
    }
    pooled
      .join(broadcast(q), Seq("pos"))
      .groupBy(col("doc_id"))
      .agg(
        sum(quant12(col("pool_val") * col("qv")).cast("decimal(38,12)"))
          .cast("double").as("dot"),
        sum((col("pool_val") * col("pool_val")).cast("decimal(38,12)"))
          .cast("double").as("nn"))
      .select(col("doc_id"), quant6(
        when(col("nn") > 0.0, col("dot") / (sqrt(col("nn")) * lit(qnorm)))
          .otherwise(lit(0.0))).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /**
   * Sliding-window chunking with overlap (the RAG-style chunker:
   * stride < window keeps context across boundaries). `stride` =
   * `window` degenerates to chunkWords.
   */
  def chunkSliding(docs: DataFrame, window: Int = 32, stride: Int = 16): DataFrame = {
    val toked = docs.select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
    val nChunks = (floor((greatest(size(col("toks")) - window, lit(0)) + stride - 1) / stride) + 1).cast("int")
    toked
      .select(col("doc_id"), col("source"), col("toks"),
        explode(when(size(col("toks")) > 0, sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))).as("chunk_idx"))
      .select(col("doc_id"), col("source"), col("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("chunk_idx") * stride + 1, lit(window)))
          .as("chunk_text"),
        least(lit(window), size(col("toks")) - col("chunk_idx") * stride).as("n_tokens"))
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)
  }

  /**
   * Corpus vocabulary statistics: document frequency per token (the
   * inverted-index build of a BM25/keyword layer, and the vocab step of
   * a tokenizer-training pipeline). One explode + one shuffle on the
   * token; top-n by (df desc, token asc).
   */
  def vocabulary(docs: DataFrame, topN: Int = 50): DataFrame = {
    import graft.GraftFunctions.distinctTokens
    docs.select(col("doc_id"), explode(distinctTokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("token").asc)
      .limit(topN)
  }

  /**
   * Tokenizer-vocabulary coverage audit: fit the corpus's own top-N
   * token vocabulary (doc-frequency ranked, the [[vocabulary]]
   * contract), then score every document's out-of-vocabulary token
   * rate — the "how much of this corpus does my tokenizer actually
   * cover" dataset card a tokenizer-training pipeline checks before
   * committing to a vocab size. Scale shape: the fitted vocab is
   * topN rows (BROADCAST side), coverage is a map-side broadcast
   * join plus one doc_id roll-up; nothing corpus-sized shuffles.
   * topN defaults low so the synthetic corpus (31 distinct tokens)
   * exercises both in- and out-of-vocab paths.
   */
  def vocabCoverage(docs: DataFrame, topN: Int = 20): DataFrame = {
    val vocab = vocabulary(docs, topN).select(col("token"), lit(1).as("iv"))
    val toks = docs
      .select(col("doc_id"), explode(graft.GraftFunctions.tokensOf(col("text"))).as("token"))
    val counted = toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), count(col("iv")).as("in_vocab"))
    docs.select(col("doc_id"))
      .join(counted, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_tokens") - col("in_vocab"), lit(0L)).as("oov_tokens"),
        round(coalesce((col("n_tokens") - col("in_vocab")) / col("n_tokens"),
          lit(0.0)), 6).as("oov_rate"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Token-id encoding — the last text-side step before tensorization:
   * every token maps to its id in the corpus-fitted vocabulary
   * (doc-frequency ranked, ids 1..topN; out-of-vocabulary -> 0, the
   * UNK convention), emitted exploded (doc_id, pos, token_id) in
   * document order. The vocab is topN rows and BROADCASTS; encoding
   * is one map-side join — nothing corpus-sized shuffles, and the
   * output is exactly the (sample, position, id) layout a training
   * loader consumes. Same fitted vocab as [[vocabCoverage]].
   */
  def tokenizeIds(docs: DataFrame, topN: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("doc_freq").desc, col("token").asc)
    // topN rows total: the single-partition rank window is driver-tiny
    val vocab = vocabulary(docs, topN)
      .withColumn("token_id", row_number().over(w).cast("int"))
      .select(col("token"), col("token_id"))
    docs.select(col("doc_id"),
        posexplode(graft.GraftFunctions.tokensOf(col("text"))).as(Seq("pos", "token")))
      .join(broadcast(vocab), Seq("token"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("token_id"), lit(0)).as("token_id"))
      .orderBy(col("doc_id").asc, col("pos").asc)
  }

  /**
   * Per-source top n-grams by document frequency — the boilerplate/
   * template detector's ranked view (which phrases dominate each
   * source), and the candidate list a decontamination blocklist
   * starts from. Shape at scale: grams dedup per document map-side
   * (array_distinct before the explode), one irreducible shuffle on
   * (source, gram) for the exact document frequencies, then the
   * per-source top-k as a NATIVE bounded aggregate (graft_topk_str,
   * partial-aggregable) — the rank-window form would re-shuffle and
   * SORT the full per-source gram vocabulary (the long-count/string
   * key shape the TopKWindowRewrite rule does not cover); the
   * aggregate's post-count shuffle carries k entries per source per
   * partition, never the vocabulary.
   */
  def topNgrams(docs: DataFrame, n: Int = 3, k: Int = 10): DataFrame = {
    val grams = when(size(col("toks")) >= n,
      transform(sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    // The gram string stays the agg key HERE by design: the final
    // rows output it, so a hashed key would still carry the string as
    // payload (bytes unchanged, plus two hashes per gram) — measured
    // slower. Contrast sourceOverlap/bigramSurprise, whose outputs
    // carry no gram and shuffle hash pairs instead.
    val counts = graft.GraftFunctions.scaleScan(docs)
      .select(col("source"), graft.GraftFunctions.tokensOf(col("text")).as("toks"))
      .select(col("source"), explode(array_distinct(grams)).as("ngram"))
      .groupBy(col("source"), col("ngram"))
      .agg(count(lit(1)).as("df"))
    counts
      .groupBy(col("source"))
      .agg(graft.GraftFunctions.topKStrings(col("ngram"), col("df"), k).as("tk"))
      .select(col("source"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("source"), col("e.item").as("ngram"), col("e.score").as("df"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("source").asc, col("rank").asc)
  }

  /**
   * Corpus-unigram surprise per document: mean -ln p(token) under the
   * corpus's own unigram distribution — the self-contained stand-in
   * for an LM-perplexity quality gate (gibberish and off-distribution
   * docs score high, boilerplate scores low). No external model: the
   * corpus IS the model, computed in the same job.
   *
   * Shape at scale: token counts are two hash aggregates on compact
   * (token) / (doc_id, token) keys with map-side combine; the corpus
   * count table (vocabulary-sized, far smaller than the corpus) joins
   * the per-doc DISTINCT token table on the token key — multiplicity
   * is carried as a count, so the join fans out per distinct
   * doc-token, never per occurrence. surprise = ln T − Σ c_d·ln c_w / n_d
   * — one pass, no per-token probability row.
   */
  def unigramSurprise(docs: DataFrame): DataFrame = {
    // Single TOKENS stay string keys by design: a (xxhash64, murmur3)
    // pair is 12 bytes — larger than most tokens — so hashing grows
    // the shuffle and pays two hashes per occurrence (measured
    // slower). The hashed-key discipline applies where gram keys are
    // long: bigramSurprise / sourceOverlap.
    val docTok = graft.GraftFunctions.scaleScan(docs)
      .select(col("doc_id"), explode(graft.GraftFunctions.tokensOf(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val corpus = docTok.groupBy(col("tok"))
      .agg(sum(col("c")).as("cw"))
    val total = corpus.agg(sum(col("cw")).as("t"))
    val perDoc = docTok.join(corpus, "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("double") * log(col("cw").cast("double"))).as("slc"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n"),
        quant6(log(col("t").cast("double")) - col("slc") / col("n")).as("surprise"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n"), lit(0L)).as("n_tokens"),
        coalesce(col("surprise"), lit(0.0)).as("surprise"))
      .orderBy(col("doc_id").asc)
  }

  /**
   * Corpus-bigram surprise per document: mean −ln p(w_i | w_{i-1})
   * under the corpus's bigram MLE (p(w|v) = c(v w) / c(v ·)) — the
   * second-order companion of [[unigramSurprise]]: fluent-but-rare
   * word SEQUENCES now score high even when each word is common
   * (and boilerplate scores near zero). Same scale shape: bigram
   * count tables are corpus-derived, joins fan out per distinct
   * doc-bigram, the per-doc fold is one aggregate.
   */
  def bigramSurprise(docs: DataFrame): DataFrame = {
    val toks = graft.GraftFunctions.tokensOf(col("text"))
    // Bigram and prefix (conditioning word) identities shuffle as
    // compact (xxhash64, murmur3) pairs computed map-side at gram
    // generation — no output column carries a gram string, so the
    // strings never leave the tokenizing stage, and the prefix key is
    // carried instead of being re-split out of the bigram inside the
    // join condition.
    val pairs = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(
          xxhash64(element_at(toks, i), element_at(toks, i + 1)).as("b1"),
          hash(element_at(toks, i), element_at(toks, i + 1)).as("b2"),
          xxhash64(element_at(toks, i)).as("p1"),
          hash(element_at(toks, i)).as("p2"))))
      .otherwise(array().cast("array<struct<b1:bigint,b2:int,p1:bigint,p2:int>>"))
    val docBi = docs.select(col("doc_id"), explode(pairs).as("p"))
      .select(col("doc_id"), col("p.b1").as("b1"), col("p.b2").as("b2"),
        col("p.p1").as("p1"), col("p.p2").as("p2"))
      .groupBy(col("doc_id"), col("b1"), col("b2"))
      .agg(count(lit(1)).as("c"), first(col("p1")).as("p1"), first(col("p2")).as("p2"))
    val corpusBi = docBi.groupBy(col("b1"), col("b2"))
      .agg(sum(col("c")).as("cb"), first(col("p1")).as("p1"), first(col("p2")).as("p2"))
    val prefix = corpusBi
      .groupBy(col("p1"), col("p2"))
      .agg(sum(col("cb")).as("cp"))
    val perDoc = docBi.join(corpusBi.drop("p1", "p2"), Seq("b1", "b2"))
      .join(prefix, Seq("p1", "p2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("m"),
        sum(col("c").cast("double") *
          (log(col("cp").cast("double")) - log(col("cb").cast("double")))).as("s"))
      .select(col("doc_id"), col("m"),
        quant6(col("s") / col("m")).as("surprise"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("m"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprise"), lit(0.0)).as("surprise"))
      .orderBy(col("doc_id").asc)
  }

  /** Per-source corpus statistics over chunks (reference get_chunk_stats). */
  def chunkStats(docs: DataFrame, window: Int = 32): DataFrame = {
    chunksUnordered(docs, window)
      .groupBy(col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("total_tokens"),
        quant6(avg(col("n_tokens"))).as("avg_chunk_tokens"))
      .orderBy(col("source").asc)
  }
}
