package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus byte-pair-encoding: a distributed merge-table fit and a
 * replayable subword encoder — the budgeting layer a training
 * pipeline actually packs with (the reference service budgets chunks
 * by sentence/char counts only, services/chunk_service.py; real
 * dataset assembly budgets in SUBWORD tokens, so tokenize_ids /
 * shard_pack / pack_sequences gain BPE twins here).
 *
 * Shapes, 100 TB first:
 *  - The fit pays ONE corpus-scale aggregate (word → frequency); all
 *    `nMerges` iterations then run over the VOCAB-scale distinct-word
 *    table — pair counting is a map-side explode + partial-aggregated
 *    groupBy over words, never over documents. `maxVocab` caps the
 *    iterated table deterministically (freq desc, word asc) for
 *    planet-scale corpora where even the vocab is huge; the fitted
 *    merge list is k-scale driver state (the k-means-centroid replay
 *    contract: fitted geometry broadcasts as literals).
 *  - Encoding is pure per-row column arithmetic (regexp word
 *    extraction + one codegen'd REPLACE per merge), whole-stage
 *    codegen friendly, no UDF, no shuffle beyond the per-doc count
 *    aggregate.
 *
 * Replay contract (what makes this oracle-gatable): a word's
 * segmentation is a `|`-separated symbol string ("hello" →
 * "|h|e|l|l|o") and applying merge (l, r) is string REPLACE of
 * "|l|r" with "|lr" — leftmost non-overlapping, which IS the BPE
 * merge scan ("aaa" + (a,a) → [aa, a]), and is exactly the REPLACE
 * DuckDB executes, so the oracle replays the encoder verbatim with
 * the fitted merges inlined as literals, and replays the FIT by
 * re-deriving each rank's argmax pair under the first i-1 merges.
 */
object Bpe {
  /** One fitted merge: at `rank`, symbols `left`+`right` fused, having
    * been the most frequent adjacent pair (weighted by word frequency,
    * ties broken lexicographically) with weight `freq`. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Word regex shared with the oracle replay (DuckDB
    * regexp_extract_all over lower()d text — keep in sync). */
  val WordRe = "[a-z]+"

  /** `|`-separated symbol form of a word: "hello" → "|h|e|l|l|o". */
  def segInit(word: Column): Column =
    regexp_replace(word, "(.)", "|$1")

  /** Apply fitted merges in rank order — one REPLACE per merge. */
  def applyMerges(seg: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(seg)((c, m) =>
      call_function("replace", c,
        lit("|" + m.left + "|" + m.right), lit("|" + m.left + m.right)))

  /** Word-frequency table: the ONE corpus-scale aggregate of the fit. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
        expr(s"regexp_extract_all(lower($textCol), '$WordRe', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Fit `nMerges` BPE merges over the corpus. Deterministic: exact
    * integer pair weights, argmax with (freq desc, left asc, right
    * asc) tie-break. Stops early when no adjacent pair remains. Each
    * iteration runs one vocab-scale aggregate; the working table is
    * localCheckpoint()ed per merge so lineage stays flat across the
    * iterative REPLACE chain. */
  def fit(docs: DataFrame, textCol: String = "text", nMerges: Int = 10,
          maxVocab: Int = 0): Seq[Merge] = {
    require(nMerges >= 1, "nMerges must be >= 1")
    var vocab = wordFreqs(docs, textCol)
    if (maxVocab > 0)
      vocab = vocab.orderBy(col("freq").desc, col("word").asc).limit(maxVocab)
    var seg = vocab.select(col("freq"), segInit(col("word")).as("seg"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var rank = 0
    var dry = false
    while (rank < nMerges && !dry) {
      val top = seg.select(col("freq"), split(col("seg"), "\\|").as("a"))
        .where(size(col("a")) >= 3) // leading "" + at least 2 symbols
        .select(col("freq"), explode(expr(
          "transform(sequence(2, size(a) - 1), " +
          "i -> struct(element_at(a, i) AS l, element_at(a, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val m = Merge(rank, top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        out += m
        seg = seg.withColumn("seg", applyMerges(col("seg"), Seq(m)))
          .localCheckpoint()
        rank += 1
      }
    }
    out.result()
  }

  /** The fitted merge table as a frame: (rank, l, r, freq). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.freq))
      .toDF("rank", "l", "r", "freq").orderBy(col("rank").asc)
  }

  /** Exploded (…, word, bpe_seg, n_bpe) frame: one row per extracted
    * word, its encoded segmentation, and its subword-token count. */
  def encodeWords(docs: DataFrame, textCol: String,
                  merges: Seq[Merge]): DataFrame =
    docs.withColumn("word", explode(
        expr(s"regexp_extract_all(lower($textCol), '$WordRe', 0)")))
      .withColumn("bpe_seg", applyMerges(segInit(col("word")), merges))
      .withColumn("n_bpe",
        (size(split(col("bpe_seg"), "\\|")) - 1).cast("long"))

  /** Per-doc subword budget: (idCol, n_words, n_bpe_tokens). Docs with
    * zero extractable words keep a 0 row — packing needs every doc. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val counts = encodeWords(docs.select(col(idCol), col(textCol)),
        textCol, merges)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("n_bpe").as("n_bpe_tokens"))
    docs.select(col(idCol)).join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /** [[graft.operators.Pipeline.packSequences]] re-expressed over BPE
    * token budgets: the per-source token stream carved into fixed
    * `seqLen`-subword sequences — same integer window math, the count
    * column now the ENCODED length a training loader actually packs.
    * One word-count aggregate + one per-source window shuffle. */
  def packSequencesBpe(docs: DataFrame, merges: Seq[Merge],
                       seqLen: Int = 1024): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"))
      .join(tokenCounts(docs, "doc_id", "text", merges)
        .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens")),
        Seq("doc_id"))
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
