package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/**
 * SparkSessionExtensions entry point: makes every graft function
 * available in SQL for sessions built with
 * `.withExtensions(new GraftExtensions)` or via
 * `spark.sql.extensions=graft.GraftExtensions` — the idiomatic way to
 * ship a function library to a cluster without per-session
 * registration calls.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression): Int =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue
  private def longLit(e: Expression): Long =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].longValue
  private def strLit(e: Expression): String =
    e.asInstanceOf[Literal].value.toString

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
      ("graft_dot", "dot product of two vectors",
        es => VectorDot(es(0), es(1))),
      ("graft_cosine", "cosine similarity of two vectors",
        es => VectorCosine(es(0), es(1))),
      ("graft_l2_distance", "euclidean distance of two vectors",
        es => VectorL2Distance(es(0), es(1))),
      ("graft_l1_distance", "manhattan distance of two vectors",
        es => VectorL1Distance(es(0), es(1))),
      ("graft_norm", "L2 norm of a vector",
        es => VectorNorm(es(0))),
      ("graft_l2_normalize", "L2-normalize a vector",
        es => VectorL2Normalize(es(0))),
      ("graft_embed", "deterministic text embedding (text, dim, seed)",
        es => FakeEmbed(es(0), intLit(es(1)), longLit(es(2)))),
      ("graft_mix64", "splitmix64 finalizer of a long (sampling hash)",
        es => Mix64(es(0))),
      ("graft_minhash", "minhash signature (text, shingleWords, numHashes, seed)",
        es => MinHashSig(es(0), intLit(es(1)), intLit(es(2)), longLit(es(3)))),
      ("graft_simhash", "64-bit simhash (text, seed)",
        es => SimHash64(es(0), longLit(es(1)))),
      ("graft_lsh_buckets", "LSH bucket ids (vec, tables, bits, seed)",
        es => HyperplaneBuckets(es(0), intLit(es(1)), intLit(es(2)), longLit(es(3)))),
      ("graft_fingerprint", "rolling-hash fingerprint (text, seed)",
        es => DocFingerprint(es(0), longLit(es(1)))),
      ("graft_shingle_hashes", "distinct token-shingle hashes (text, w)",
        es => ShingleHashesExpr(es(0), intLit(es(1)))),
      ("graft_text_stats", "token statistics struct (text)",
        es => TextStats(es(0), GraftFunctions.stopwordsEn)),
      ("graft_topk", "bounded top-k aggregate (id, score, k)",
        es => TopKAgg(es(0), es(1), intLit(es(2)))),
      ("graft_lsh_probes", "multi-probe LSH buckets (vec, tables, bits, probes, seed)",
        es => HyperplaneProbes(es(0), intLit(es(1)), intLit(es(2)), intLit(es(3)),
          longLit(es(4)))),
      ("graft_quantize", "int8 quantize vector -> struct(scale, bytes)",
        es => QuantizeVec(es(0))),
      ("graft_quantized_dot", "approximate dot of two quantized structs",
        es => QuantizedDot(es(0), es(1))),
      ("graft_tokens", "lowercased [a-z0-9] tokens (text)",
        es => AsciiTokens(es(0))),
      ("graft_distinct_tokens", "distinct lowercased tokens (text)",
        es => AsciiDistinctTokens(es(0))),
      ("graft_term_freqs", "doc length + term frequencies (text, 'a,b,c')",
        es => TermFreqsExpr(es(0), strLit(es(1)).split(',').toSeq)))
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    // rank-k window idiom -> bounded top-k aggregate (map-side combine
    // instead of a full shuffle+sort per group).
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
  }
}
