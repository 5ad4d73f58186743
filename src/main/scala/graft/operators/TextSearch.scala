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

  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topN: Int = 20): DataFrame = {
    require(terms.nonEmpty)
    val toked = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val withTf = toked.select(
      (col("doc_id") +: size(col("toks")).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("toks"), x => x === lit(t))).cast("double").as(s"tf$i")
        }): _*)
    val statCols = count(lit(1)).cast("double").as("n_docs") +:
      sum(col("dl")).cast("double").as("sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)

    val score = terms.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      val norm = col(s"tf$i") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / (col("sum_dl") / col("n_docs")))
      idf * (col(s"tf$i") * lit(k1 + 1.0)) / norm
    }.reduce(_ + _)

    withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topN)
  }
}
