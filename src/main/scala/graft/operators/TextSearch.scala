package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Keyword retrieval: Okapi BM25 over the corpus (the lexical half of a
 * hybrid vector+keyword search stack; Robertson & Zaragoza 2009).
 *
 * Shape at scale: per-document term frequencies are map-side column
 * algebra over the materialized token array; the corpus-level stats
 * (N, avgdl, per-term document frequencies) are ONE tiny aggregate
 * broadcast back — no shuffle of the corpus itself, and the final
 * top-n is TakeOrderedAndProject.
 */
object TextSearch {

  /** (doc_id, dl, tf0..tfN [, carry...]) — one tokenizer pass per
    * document: dl + all term frequencies from a single native
    * expression (vs |terms| interpreted HOF filters over a split()
    * array — measured 3x slower at 5k docs). Shared by [[bm25]] and
    * the single-pass [[hybrid]]. */
  private def withTermFreqs(docs: DataFrame, terms: Seq[String],
                            carry: Seq[String] = Nil): DataFrame = {
    val cc = carry.map(col)
    // (r14: a scaleScan here was tried and reverted — repartitioning
    // the full text column costs more than parallelizing the |terms|-
    // bounded tokenizer saves, A/B 0.61 -> 0.68 s on the raw-documents
    // path; the hybrid path's input is already split at ingest.)
    val tfr = docs.select(col("doc_id") +:
      graft.GraftFunctions.termFreqs(col("text"), terms).as("tfr") +: cc: _*)
    tfr.select(
      (col("doc_id") +: col("tfr.dl").cast("double").as("dl") +:
        terms.indices.map { i =>
          col("tfr.tfs").getItem(i).cast("double").as(s"tf$i")
        }) ++ cc: _*)
  }

  /** The tiny corpus-stats aggregate (N, total dl, per-term document
    * frequencies) over a [[withTermFreqs]] frame — broadcast back. */
  private def bm25Stats(withTf: DataFrame, terms: Seq[String]): DataFrame = {
    val statCols = count(lit(1)).cast("double").as("n_docs") +:
      sum(col("dl")).cast("double").as("sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i"))
    withTf.agg(statCols.head, statCols.tail: _*)
  }

  /** The Okapi BM25 score column over (tf0.., dl, broadcast stats). */
  private def bm25ScoreCol(terms: Seq[String], k1: Double, b: Double): Column =
    terms.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      val norm = col(s"tf$i") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / (col("sum_dl") / col("n_docs")))
      idf * (col(s"tf$i") * lit(k1 + 1.0)) / norm
    }.reduce(_ + _)

  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topN: Int = 20): DataFrame = {
    require(terms.nonEmpty)
    // NOT pinned (r14, measured): withTf feeds the stats aggregate and
    // the scoring pass, but the narrow tf frame recomputes in ~0.1 s
    // parallel while a pin costs a shuffle + cache-write job — A/B at
    // sf0.1 showed the pin 0.66->1.0 s slower. At 100 TB the stats
    // aggregate's second tokenizer pass is the cost a real deployment
    // avoids by materializing tf at ingest, not by a per-query cache.
    val withTf = withTermFreqs(docs, terms)
    val stats = bm25Stats(withTf, terms)
    val score = bm25ScoreCol(terms, k1, b)
    val scored = withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("score"))
      .filter(col("score") > 0.0)
    // topN == MaxValue means "all scored docs" (hybrid's candidate
    // pool): skip the ordering entirely — a downstream join would
    // destroy it anyway, and orderBy+limit(2^31) plans a global sort.
    if (topN == Int.MaxValue) scored
    else scored.orderBy(col("score").desc, col("doc_id").asc).limit(topN)
  }

  /**
   * Hybrid retrieval: convex blend of dense (cosine over embeddings)
   * and lexical (BM25) scores — the standard two-tower search stack.
   * BM25 is min-max normalized over its candidate pool so both signals
   * live on [0,1] before blending.
   *
   * `docs` must carry a precomputed `embedding` column (the library
   * store materializes one at ingest — embedding the corpus per query
   * would re-derive every document vector on every search, a
   * scale-killer at 100 TB). Only the QUERY text is embedded here.
   */
  /**
   * Batch hybrid retrieval: N queries in ONE corpus pass. All queries'
   * terms concatenate into a single termFreqs call (one tokenizer scan
   * of every document regardless of query count — the langIdMulti
   * trick), corpus statistics aggregate once, query vectors ride in as
   * literals, and each document emits one (query, bm25, dense) row per
   * query via a generated struct array. Per-query BM25 max-normalizes
   * through a tiny broadcast aggregate; the blended score ranks via
   * the bounded per-query top-k.
   */
  def hybridBatch(docs: DataFrame, queryTexts: Seq[String], alpha: Double = 0.5,
                  topN: Int = 20, dim: Int = 64,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.GraftFunctions._
    require(queryTexts.nonEmpty)
    require(docs.columns.contains("embedding"),
      "hybridBatch requires a precomputed `embedding` column")
    val spark = docs.sparkSession
    val perQueryTerms = queryTexts.map(
      _.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
    require(perQueryTerms.forall(_.nonEmpty), "every query needs at least one term")
    val allTerms = perQueryTerms.flatten.distinct
    val termIdx = allTerms.zipWithIndex.toMap
    // Query embeddings resolve driver-side (Q is small by contract)
    // and ride into the scan as literals — no query-side join at all.
    val qvecs = queryTexts.map(t => spark.range(1)
      .select(embedText(lit(t), dim).as("qv")).head.getSeq[Float](0))

    val tfr = docs.select(col("doc_id"), col("embedding"),
      termFreqs(col("text"), allTerms).as("tfr"))
    // Pinned (r14): withTf feeds the stats aggregate, the per-query
    // max aggregate and the blend — one tokenizer pass, not three.
    val withTf = graft.GraftFunctions.pin(
      tfr.select(col("doc_id") +: col("embedding") +:
        col("tfr.dl").cast("double").as("dl") +:
        allTerms.indices.map(i => col("tfr.tfs").getItem(i).cast("double").as(s"tf$i")): _*))
    val statCols = count(lit(1)).cast("double").as("n_docs") +:
      sum(col("dl")).cast("double").as("sum_dl") +:
      allTerms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)

    def bm25For(qi: Int): Column = perQueryTerms(qi).map { term =>
      val i = termIdx(term)
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      val norm = col(s"tf$i") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / (col("sum_dl") / col("n_docs")))
      idf * (col(s"tf$i") * lit(k1 + 1.0)) / norm
    }.reduce(_ + _)

    val perQuery = queryTexts.indices.map(qi => struct(
      lit(qi.toLong).as("query_id"),
      round(bm25For(qi), 6).as("bm25"),
      cosineSim(col("embedding"),
        typedLit(qvecs(qi)).cast("array<float>")).as("dense")))
    // Pinned (r14): scored feeds the per-query max aggregate AND the
    // blend, and nested pruning does NOT reach inside the exploded
    // struct array — unpinned, the cosine kernel and the BM25 algebra
    // re-evaluated per consumer (plan evidence: Generate(35) on the
    // max leg carried the full struct incl. `dense`).
    val scored = graft.GraftFunctions.pin(withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), explode(array(perQuery: _*)).as("q"))
      .select(col("doc_id"), col("q.query_id"), col("q.bm25"), col("q.dense")))
    val maxes = scored.groupBy(col("query_id"))
      .agg(max(when(col("bm25") > 0.0, col("bm25"))).as("max_bm25"))
    val blended = scored.join(broadcast(maxes), "query_id")
      .select(col("query_id"), col("doc_id"),
        round(lit(alpha) * col("dense") + lit(1.0 - alpha) *
          coalesce(when(col("bm25") > 0.0, col("bm25") / col("max_bm25")),
            lit(0.0)), 6).as("score"))
    VectorSearch.finishPerQueryTopK(blended, "doc_id", topN)
  }

  /**
   * Reciprocal-rank-fusion hybrid (Cormack, Clarke & Buettcher, SIGIR
   * 2009): each retriever contributes 1/(rrfK + rank) for the
   * documents in its top-`pool` list; the fused score ranks. Rank-
   * based fusion is the production alternative to the score blend in
   * [[hybrid]]: it needs no score normalization (BM25 and cosine live
   * on incomparable scales) and is robust to outlier scores.
   *
   * Scale shape: each retriever's list is a TakeOrderedAndProject
   * top-`pool` over its one corpus pass (dense never shuffles the
   * corpus; BM25 stats are a tiny broadcast aggregate). The rank
   * windows and the full-outer fusion run over the two pool-bounded
   * lists — driver-scale frames, so the unpartitioned windows are
   * deliberate, not a scale hazard. Integer ranks make the fusion
   * exactly replayable by a SQL oracle.
   */
  def hybridRrf(docs: DataFrame, queryText: String, topN: Int = 20,
                rrfK: Int = 60, pool: Int = 100, dim: Int = 64): DataFrame = {
    import graft.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    require(docs.columns.contains("embedding"),
      "hybridRrf requires a precomputed `embedding` column (embed at ingest, not per query)")
    require(rrfK >= 1 && pool >= topN, "need rrfK >= 1 and pool >= topN")
    val spark = docs.sparkSession
    val terms = queryText.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    // lexical list: BM25 top-pool (rounded scores, positive only —
    // the bm25 contract), ranked score-desc with id tie-break
    val lex = bm25(docs, terms, topN = pool)
    val lexRank = lex.withColumn("lr", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("lr"))
    // dense list: cosine over the STORED embeddings, top-pool
    val qv = spark.range(1).select(embedText(lit(queryText), dim).as("qvec"))
    val dense = docs.crossJoin(broadcast(qv))
      .select(col("doc_id"), cosineSim(col("embedding"), col("qvec")).as("ds"))
      .orderBy(col("ds").desc, col("doc_id").asc)
      .limit(pool)
    val denseRank = dense.withColumn("dr", row_number().over(
        Window.orderBy(col("ds").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("dr"))
    denseRank.join(lexRank, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(coalesce(lit(1.0) / (lit(rrfK) + col("dr")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("lr")), lit(0.0)), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topN)
  }

  def hybrid(docs: DataFrame, queryText: String, alpha: Double = 0.5,
             topN: Int = 20, dim: Int = 64,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.GraftFunctions._
    require(docs.columns.contains("embedding"),
      "hybrid requires a precomputed `embedding` column (embed at ingest, not per query)")
    val spark = docs.sparkSession
    val terms = queryText.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    // Single-pass fusion (r13, the hybridBatch shape): bm25 and dense
    // both derive from the SAME document row, so the lexical and dense
    // retrievers never needed separate corpus scans joined back on
    // doc_id — that join shuffled the corpus twice for nothing. Now:
    // one stats aggregate, one scoring pass emitting (bm25, dense)
    // together, one tiny max aggregate, blend, top-k. Plan: the two
    // doc_id hash Exchanges are GONE (broadcast-only); scores are
    // bit-identical (same formulas, same 6-dp rounding points).
    // Pinned (r14, ADVICE): withTf feeds the stats aggregate, the
    // max-bm25 leg and the final blend — unpinned, the tokenizer ran
    // once per consumer (the r13 comment's 'one scoring pass' was one
    // pass per CONSUMER of `scored`). With the pin: termFreqs once,
    // cosine once (column-pruned off the max leg), bm25 algebra twice.
    val withTf = graft.GraftFunctions.pin(
      withTermFreqs(docs, terms, carry = Seq("embedding")))
    val stats = bm25Stats(withTf, terms)
    val qv = spark.range(1).select(embedText(lit(queryText), dim).as("qvec"))
    val scored = withTf.crossJoin(broadcast(stats)).crossJoin(broadcast(qv))
      .select(col("doc_id"),
        round(bm25ScoreCol(terms, k1, b), 6).as("bm25"),
        cosineSim(col("embedding"), col("qvec")).as("dense_score"))
    val maxB = scored.agg(max(when(col("bm25") > 0.0, col("bm25"))).as("max_bm25"))
    scored.crossJoin(broadcast(maxB))
      .select(col("doc_id"),
        round(lit(alpha) * col("dense_score") +
          lit(1.0 - alpha) * coalesce(
            when(col("bm25") > 0.0, col("bm25") / col("max_bm25")),
            lit(0.0)), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topN)
  }
}
