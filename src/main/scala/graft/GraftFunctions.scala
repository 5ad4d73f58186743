package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import graft.functions._

/**
 * Registration + Column API for graft's native expressions.
 *
 * Expressions are registered in the session FunctionRegistry and
 * exposed through `call_function`, which keeps the library on public
 * Spark API only (no private Column constructors).
 */
object GraftFunctions {

  /**
   * Pin a frame that several downstream consumers re-read. Default is
   * `persist(DISK_ONLY)`: blocks spill to executor disk but the
   * LINEAGE SURVIVES, so a lost executor recomputes its blocks instead
   * of killing the job — the property `localCheckpoint` gives up (it
   * truncates lineage and pins blocks with no fallback; acceptable
   * only on a single machine). `spark.graft.pin`:
   *  - "disk" (default): persist(DISK_ONLY), recomputable.
   *  - "reliable": df.checkpoint() — durable copy in the configured
   *    checkpoint dir (the cluster-profile choice when lineage is too
   *    expensive to replay).
   *  - "local": localCheckpoint(), the old single-machine behavior.
   */
  private[graft] def pin(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.sparkSession.conf.get("spark.graft.pin", "disk") match {
      case "local" => df.localCheckpoint()
      case "reliable" => df.checkpoint()
      case _ => df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    }

  /**
   * Pin ITERATIVE loop state. Unlike [[pin]], lineage must TRUNCATE
   * each round — a plan that references the previous round's result
   * more than once doubles per iteration and overwhelms the optimizer
   * long before data size matters — so this is an eager checkpoint:
   *  - RELIABLE (df.checkpoint) when a checkpoint dir is configured —
   *    the cluster profile; loop state survives executor loss.
   *  - In local mode with no dir configured, a temp dir is
   *    auto-provisioned (same machine, same durability as any local
   *    run).
   *  - On a cluster with NO checkpoint dir, falls back to
   *    localCheckpoint — configure spark.checkpoint.dir to get
   *    executor-loss durability. `spark.graft.pin.iter=local` forces
   *    the old behavior.
   */
  private[graft] def pinIter(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sc = df.sparkSession.sparkContext
    df.sparkSession.conf.get("spark.graft.pin.iter", "reliable") match {
      case "local" => df.localCheckpoint()
      case _ =>
        if (sc.getCheckpointDir.isEmpty) {
          if (sc.isLocal)
            sc.setCheckpointDir(
              java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
          else return df.localCheckpoint()
        }
        df.checkpoint()
    }
  }

  private def intLit(e: Expression): Int =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue
  private def longLit(e: Expression): Long =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].longValue
  private def strLit(e: Expression): String =
    e.asInstanceOf[Literal].value.toString

  /** Idempotent; call once per SparkSession before using the helpers. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      es => VectorDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine",
      es => VectorCosine(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_l2_distance",
      es => VectorL2Distance(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_l1_distance",
      es => VectorL1Distance(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_norm",
      es => VectorNorm(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_l2_normalize",
      es => VectorL2Normalize(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_embed",
      es => FakeEmbed(es(0), intLit(es(1)), longLit(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_mix64",
      es => Mix64(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash",
      es => MinHashSig(es(0), intLit(es(1)), intLit(es(2)), longLit(es(3))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash",
      es => SimHash64(es(0), longLit(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_lsh_buckets",
      es => HyperplaneBuckets(es(0), intLit(es(1)), intLit(es(2)), longLit(es(3))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_fingerprint",
      es => DocFingerprint(es(0), longLit(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      es => ShingleHashesExpr(es(0), intLit(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_text_stats",
      es => TextStats(es(0), stopwordsEn), "scala_udf")
    reg.createOrReplaceTempFunction("graft_topk",
      es => TopKAgg(es(0), es(1), intLit(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_lsh_probes",
      es => HyperplaneProbes(es(0), intLit(es(1)), intLit(es(2)), intLit(es(3)),
        longLit(es(4))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_quantize",
      es => QuantizeVec(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_quantized_dot",
      es => QuantizedDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_tokens",
      es => AsciiTokens(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_distinct_tokens",
      es => AsciiDistinctTokens(es(0)), "scala_udf")
    // terms ride as one comma-separated literal (tokens never contain ',')
    reg.createOrReplaceTempFunction("graft_term_freqs",
      es => TermFreqsExpr(es(0), strLit(es(1)).split(',').toSeq), "scala_udf")
  }

  /** Canonical english stopword list (mirrored in the DuckDB oracle). */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is",
    "on", "for", "with", "as", "at", "by", "an", "be", "this", "that", "it", "or")

  // ---- Column helpers ----------------------------------------------------
  def dotProduct(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosineSim(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def l2Distance(a: Column, b: Column): Column = call_function("graft_l2_distance", a, b)
  def l1Distance(a: Column, b: Column): Column = call_function("graft_l1_distance", a, b)
  /** Reference semantics: euclidean similarity = 1/(1+L2). */
  def euclideanSim(a: Column, b: Column): Column = lit(1.0) / (lit(1.0) + l2Distance(a, b))
  /** Reference semantics: manhattan similarity = 1/(1+L1). */
  def manhattanSim(a: Column, b: Column): Column = lit(1.0) / (lit(1.0) + l1Distance(a, b))
  def vecNorm(a: Column): Column = call_function("graft_norm", a)
  def l2Normalize(a: Column): Column = call_function("graft_l2_normalize", a)

  def embedText(text: Column, dim: Int = 64, seed: Long = 42L): Column =
    call_function("graft_embed", text, lit(dim), lit(seed))

  /** splitmix64 finalizer of a long column (deterministic sampling). */
  def mix64(c: Column): Column = call_function("graft_mix64", c)

  /** Embedding input types (reference embedding_service.py:169-233:
    * `search_document` at ingest vs `search_query` at search time). */
  val embedInputTypes: Set[String] = Set("search_document", "search_query")

  /** Input-typed embedding. The deterministic stand-in is symmetric —
    * both types map to the SAME projection so the doc and query spaces
    * stay aligned, exactly like a single-tower embedder — but the
    * contract point exists so a real two-tower model (distinct doc/
    * query encoders) plugs in without an API change, and an invalid
    * input type fails fast as in the reference. */
  def embedTextTyped(text: Column, inputType: String,
                     dim: Int = 64, seed: Long = 42L): Column = {
    require(embedInputTypes(inputType),
      s"unknown embedding input type '$inputType' (expected ${embedInputTypes.mkString(" or ")})")
    embedText(text, dim, seed)
  }
  def minhashSig(text: Column, shingleWords: Int = 3, numHashes: Int = 64, seed: Long = 42L): Column =
    call_function("graft_minhash", text, lit(shingleWords), lit(numHashes), lit(seed))
  def simhash(text: Column, seed: Long = 42L): Column =
    call_function("graft_simhash", text, lit(seed))
  def lshBuckets(vec: Column, numTables: Int = 8, bitsPerTable: Int = 8, seed: Long = 42L): Column =
    call_function("graft_lsh_buckets", vec, lit(numTables), lit(bitsPerTable), lit(seed))
  def lshProbes(vec: Column, numTables: Int = 8, bitsPerTable: Int = 8,
                extraProbes: Int = 2, seed: Long = 42L): Column =
    call_function("graft_lsh_probes", vec, lit(numTables), lit(bitsPerTable),
      lit(extraProbes), lit(seed))
  def docFingerprint(text: Column, seed: Long = 42L): Column =
    call_function("graft_fingerprint", text, lit(seed))
  def shingleHashes(text: Column, shingleWords: Int = 3): Column =
    call_function("graft_shingle_hashes", text, lit(shingleWords))
  def textStats(text: Column): Column =
    call_function("graft_text_stats", text)
  /** Native bounded top-k aggregate -> array<struct<id,score>>. */
  def topKAgg(id: Column, score: Column, k: Int): Column =
    call_function("graft_topk", id, score, lit(k))
  /** vector -> struct(scale, int8 bytes): 4x compressed form. */
  def quantizeVec(vec: Column): Column = call_function("graft_quantize", vec)
  /** approximate dot of two quantized structs. */
  def quantizedDot(a: Column, b: Column): Column =
    call_function("graft_quantized_dot", a, b)

  /** Hamming distance between two 64-bit fingerprints (codegen'd built-ins). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Lowercased [a-z0-9]-run tokens (cross-engine token contract). */
  def tokensOf(text: Column): Column = call_function("graft_tokens", text)
  /** Distinct lowercased tokens. */
  def distinctTokens(text: Column): Column = call_function("graft_distinct_tokens", text)
  /** struct(dl, tfs): doc length + per-term frequencies in one pass. */
  def termFreqs(text: Column, terms: Seq[String]): Column = {
    // The kernel matches tokens literally, so any term outside the
    // lowercased [a-z0-9]+ token alphabet would silently score tf=0 —
    // fail fast instead.
    require(terms.forall(_.matches("[a-z0-9]+")),
      s"termFreqs terms must be lowercased [a-z0-9]+ strings: $terms")
    call_function("graft_term_freqs", text, lit(terms.mkString(",")))
  }
}
