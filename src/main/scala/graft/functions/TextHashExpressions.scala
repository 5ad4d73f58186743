package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic hashing primitives used by the embedding stand-in and
 * the dedup suite. All randomness is derived from a fixed seed through
 * a splitmix64-style mixer, so results are identical on every executor
 * with no broadcast state (SURVEY.md paragraph 5).
 */
object TextHash {

  /** splitmix64 finalizer — a well-known public-domain mixing function. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** True iff c is a token character under the cross-engine contract:
    * tokens are maximal [a-z0-9] runs of the simple-lowercased text
    * (`lower(text)` then split `[^a-z0-9]+` — identical to the DuckDB
    * oracle; non-ASCII letters act as separators). */
  @inline def isTok(c: Char): Boolean = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Locale-independent SIMPLE lowercase (one code unit -> one code
    * unit, Character.toLowerCase) — the mapping DuckDB's utf8proc
    * lower() applies, measured: lower('İstanbul') = 'istanbul'
    * (8 chars). The JDK's String.toLowerCase would instead apply the
    * FULL mapping — U+0130 -> "i" + combining dot, changing string
    * length and splitting the token — and is locale-sensitive (a
    * Turkish default locale maps I -> dotless ı). U+0130 is Unicode's
    * only non-locale multi-char lowercase mapping, so simple mapping
    * diverges from full on exactly that char. Unchanged strings pay
    * one scan and zero allocation. */
  @inline def lowered(text: UTF8String): String = {
    val s = text.toString
    val n = s.length
    var i = 0
    while (i < n && Character.toLowerCase(s.charAt(i)) == s.charAt(i)) i += 1
    if (i == n) s
    else {
      val arr = s.toCharArray
      var j = i
      while (j < n) { arr(j) = Character.toLowerCase(arr(j)); j += 1 }
      new String(arr)
    }
  }

  /** FNV-1a 64-bit over a token span of an already-lowered string. */
  @inline def fnv1a(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Token spans ([a-z0-9] runs) of a lowered string, as (start,end) pairs. */
  def tokenSpans(s: String): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0; val n = s.length
    while (i < n) {
      if (isTok(s.charAt(i))) {
        val start = i
        while (i < n && isTok(s.charAt(i))) i += 1
        out += (start.toLong << 32) | (i.toLong & 0xffffffffL)
      } else i += 1
    }
    out.toArray
  }

  /** Hashes of all tokens of a lowered string. */
  def tokenHashes(s: String): Array[Long] = {
    val spans = tokenSpans(s)
    val out = new Array[Long](spans.length)
    var i = 0
    while (i < spans.length) {
      val start = (spans(i) >>> 32).toInt
      val end = (spans(i) & 0xffffffffL).toInt
      out(i) = fnv1a(s, start, end)
      i += 1
    }
    out
  }

  /**
   * Deterministic bag-of-words random-projection embedding: each token
   * contributes a seeded pseudo-random direction; the sum is
   * L2-normalized. Texts sharing most tokens embed close in cosine —
   * the same contract as the reference's external embedding API
   * (/root/reference/services/embedding_service.py:205-225) without
   * network egress.
   */
  def embed(text: UTF8String, dim: Int, seed: Long): ArrayData = {
    val s = lowered(text)
    val hashes = tokenHashes(s)
    val v = new Array[Double](dim)
    var t = 0
    while (t < hashes.length) {
      var state = mix64(hashes(t) ^ seed)
      var j = 0
      while (j < dim) {
        state = mix64(state)
        // uniform in [-1, 1): (state>>>11) spans [0, 2^53), so /2^52
        // lands in [0, 2). (The former *2.0-1.0 on the same quotient
        // spanned [-1, 3) — a +1 mean per token per component that
        // collapsed every embedding toward the all-ones direction:
        // noise pairs at cosine ~0.98, all sign bits positive, LSH
        // buckets degenerate. Caught by the high-dim recall ladder.)
        v(j) += (state >>> 11).toDouble / (1L << 52).toDouble - 1.0
        j += 1
      }
      t += 1
    }
    var acc = 0.0; var j = 0
    while (j < dim) { acc += v(j) * v(j); j += 1 }
    val norm = math.sqrt(acc)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (if (norm > 0.0) v(j) / norm else 0.0).toFloat; j += 1 }
    new GenericArrayData(out)
  }

  /**
   * MinHash signature over token w-shingles in a single pass: shingle
   * hash = mix of member token hashes; per-permutation hash
   * h_i(x) = mix64(x ^ mix64(seed+i)). Standard MinHash construction
   * (Broder 1997).
   */
  def minhash(text: UTF8String, shingleWords: Int, numHashes: Int, seed: Long): ArrayData = {
    val toks = tokenHashes(lowered(text))
    val sig = Array.fill(numHashes)(Long.MaxValue)
    // Multiply-shift universal family h_i(x) = a_i*x + b_i (odd a_i)
    // over the already-mixed shingle hash: 2 ops per (shingle, i)
    // instead of a full 9-op mix64 — the inner product dominates at
    // shingles x numHashes per document.
    val pa = new Array[Long](numHashes)
    val pb = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      pa(i) = mix64(seed + 2L * i) | 1L
      pb(i) = mix64(seed + 2L * i + 1L)
      i += 1
    }
    if (toks.length >= shingleWords) {
      var p = 0
      while (p <= toks.length - shingleWords) {
        var sh = 0x27d4eb2f165667c5L
        var q = 0
        while (q < shingleWords) { sh = mix64(sh ^ toks(p + q)); q += 1 }
        i = 0
        while (i < numHashes) {
          val h = pa(i) * sh + pb(i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        p += 1
      }
    }
    new GenericArrayData(sig)
  }

  /**
   * 64-bit SimHash (Charikar 2002) over token w-shingle hashes.
   * Shingle features (vs unigrams) make random documents' bits nearly
   * independent even over a small vocabulary, so Hamming distance
   * tracks shingle-Jaccard and banded buckets stay balanced.
   */
  def simhash(text: UTF8String, seed: Long, shingleWords: Int = 3): Long = {
    val toks = tokenHashes(lowered(text))
    val votes = new Array[Int](64)
    if (toks.length >= shingleWords) {
      var p = 0
      while (p <= toks.length - shingleWords) {
        var sh = 0x27d4eb2f165667c5L
        var q = 0
        while (q < shingleWords) { sh = mix64(sh ^ toks(p + q)); q += 1 }
        val h = mix64(sh ^ seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        p += 1
      }
    }
    var out = 0L; var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /**
   * Seeded hyperplane matrix for sign-random-projection LSH:
   * (numTables*bitsPerTable) rows of `dim` components in [-1,1),
   * derived deterministically from the seed. Computed once on the
   * driver and shipped as a codegen reference object — the per-row
   * cost is pure fused multiply-adds, no hashing.
   */
  def hyperplanes(numTables: Int, bitsPerTable: Int, dim: Int, seed: Long): Array[Double] = {
    val out = new Array[Double](numTables * bitsPerTable * dim)
    var t = 0
    while (t < numTables) {
      var b = 0
      while (b < bitsPerTable) {
        var state = mix64(seed ^ (t.toLong << 32) ^ b.toLong)
        var j = 0
        while (j < dim) {
          state = mix64(state)
          // uniform in [-1, 1) — same distribution fix as embed()
          out((t * bitsPerTable + b) * dim + j) =
            (state >>> 11).toDouble / (1L << 52).toDouble - 1.0
          j += 1
        }
        b += 1
      }
      t += 1
    }
    out
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int, Int), Array[Double]]()

  /** Per-JVM cached hyperplane matrix (dim discovered from the data). */
  def planesFor(numTables: Int, bitsPerTable: Int, dim: Int, seed: Long): Array[Double] =
    planeCache.computeIfAbsent((seed, numTables, bitsPerTable, dim),
      _ => hyperplanes(numTables, bitsPerTable, dim, seed))

  /** Entry point used by the HyperplaneBuckets expression. */
  def hyperplaneBucketsCached(vec: ArrayData, isFloat: Boolean, numTables: Int,
                              bitsPerTable: Int, seed: Long): ArrayData =
    hyperplaneBuckets(vec, isFloat, numTables, bitsPerTable,
      planesFor(numTables, bitsPerTable, vec.numElements(), seed))

  /**
   * Sign-random-projection LSH bucket ids, one per table: bucket =
   * bitsPerTable sign bits of dots with the precomputed hyperplanes.
   * Generalizes the reference's 1-bit-per-table scheme
   * (/root/reference/vector_db/algorithms.py:271-310) to multi-bit
   * buckets so candidate sets stay sub-linear at scale.
   */
  def hyperplaneBuckets(vec: ArrayData, isFloat: Boolean, numTables: Int,
                        bitsPerTable: Int, planes: Array[Double]): ArrayData = {
    val d = vec.numElements()
    // Bulk-copy once: the inner loops below touch the vector
    // numTables*bitsPerTable times — per-element ArrayData accessors
    // there would dominate (measured 7x slower at 1M rows).
    val v = new Array[Double](d)
    if (isFloat) {
      val f = vec.toFloatArray()
      var j = 0
      while (j < d) { v(j) = f(j); j += 1 }
    } else {
      val dd = vec.toDoubleArray()
      var j = 0
      while (j < d) { v(j) = dd(j); j += 1 }
    }
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var b = 0
      while (b < bitsPerTable) {
        val base = (t * bitsPerTable + b) * d
        var dot = 0.0
        var j = 0
        while (j < d) { dot += planes(base + j) * v(j); j += 1 }
        if (dot >= 0.0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Distinct hashes of token w-shingles in one pass (tokenize + hash +
   * dedup). Join-side twin of the string-shingle oracle: token strings
   * contain no separator, so the triple -> string mapping is injective
   * and distinct-hash cardinalities equal distinct-string cardinalities
   * (modulo 2^-64 collisions).
   */
  /** Positional shingle hashes: one mix-chain hash per w-token window,
    * in document order (the seed and fold are part of the cross-engine
    * oracle contract — HashSql.shingle replays this exactly). */
  private def positionalShingleHashes(toks: Array[Long], shingleWords: Int): Array[Long] = {
    val n = toks.length - shingleWords + 1
    val hs = new Array[Long](n)
    var p = 0
    while (p < n) {
      var sh = 0x27d4eb2f165667c5L
      var q = 0
      while (q < shingleWords) { sh = mix64(sh ^ toks(p + q)); q += 1 }
      hs(p) = sh
      p += 1
    }
    hs
  }

  /** In-place sort + adjacent-dedup; returns the distinct prefix. */
  private def sortedDistinct(a: Array[Long]): Array[Long] = {
    if (a.isEmpty) return a
    java.util.Arrays.sort(a)
    var w = 1; var i = 1
    while (i < a.length) { if (a(i) != a(i - 1)) { a(w) = a(i); w += 1 }; i += 1 }
    java.util.Arrays.copyOf(a, w)
  }

  def shingleHashes(text: UTF8String, shingleWords: Int): ArrayData = {
    val toks = tokenHashes(lowered(text))
    if (toks.length < shingleWords) return new GenericArrayData(Array.empty[Long])
    new GenericArrayData(sortedDistinct(positionalShingleHashes(toks, shingleWords)))
  }

  /**
   * Winnowing document sketch (Schleimer/Wilkerson/Aiken, SIGMOD 2003
   * — the MOSS local-similarity fingerprint): positional 3-token
   * shingle hashes, then the MINIMUM hash of every sliding window of
   * `window` consecutive shingles; the distinct selected minima are
   * the sketch. Guarantee: any shared token run covering
   * window+shingleWords-1 tokens contributes at least one COMMON
   * sketch hash to both documents — local plagiarism/quotation
   * detection with a sketch ~2/(window+1) the shingle count.
   *
   * Window minima compare UNSIGNED (the oracle's UBIGINT list_min
   * order); the returned array sorts SIGNED ascending (both engines
   * sort the converted values). Docs with fewer than
   * window+shingleWords-1 tokens sketch empty.
   */
  def winnowSketch(text: UTF8String, shingleWords: Int, window: Int): ArrayData = {
    require(shingleWords >= 1 && window >= 1,
      s"winnow sketch needs shingleWords >= 1 and window >= 1, got ($shingleWords, $window)")
    val toks = tokenHashes(lowered(text))
    if (toks.length < shingleWords + window - 1)
      return new GenericArrayData(Array.empty[Long])
    val hs = positionalShingleHashes(toks, shingleWords)
    val m = hs.length - window + 1
    val sel = new Array[Long](m)
    var p = 0
    while (p < m) {
      var mn = hs(p)
      var q = 1
      while (q < window) {
        if (java.lang.Long.compareUnsigned(hs(p + q), mn) < 0) mn = hs(p + q)
        q += 1
      }
      sel(p) = mn
      p += 1
    }
    new GenericArrayData(sortedDistinct(sel))
  }

  /**
   * One-pass per-document token statistics:
   * (n_tokens, n_unique, total_token_chars, stopword_hits).
   * Feeds tokenStats / qualityScore / langId without re-tokenizing per
   * derived column.
   */
  def textStats(text: UTF8String, stopHashes: Array[Long]): org.apache.spark.sql.catalyst.InternalRow = {
    val s = lowered(text)
    val spans = tokenSpans(s)
    val hashes = new Array[Long](spans.length)
    var totalLen = 0L
    var stopHits = 0
    var i = 0
    while (i < spans.length) {
      val start = (spans(i) >>> 32).toInt
      val end = (spans(i) & 0xffffffffL).toInt
      val h = fnv1a(s, start, end)
      hashes(i) = h
      totalLen += end - start
      if (java.util.Arrays.binarySearch(stopHashes, h) >= 0) stopHits += 1
      i += 1
    }
    java.util.Arrays.sort(hashes)
    var unique = if (hashes.length > 0) 1 else 0
    i = 1
    while (i < hashes.length) { if (hashes(i) != hashes(i - 1)) unique += 1; i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](spans.length, unique, totalLen, stopHits))
  }

  /** Sorted token hashes of a word list (driver-side, for textStats). */
  def hashWords(words: Seq[String]): Array[Long] = {
    val hs = words.map(w => fnv1a(w, 0, w.length)).toArray
    java.util.Arrays.sort(hs)
    hs
  }

  /**
   * Multi-probe LSH buckets for the QUERY side: per table, the main
   * bucket plus `extraProbes` variants with the lowest-|margin| sign
   * bits flipped (Lv et al. 2007, multi-probe LSH) — the buckets the
   * true neighbors most likely fell into when a near-zero dot product
   * landed on the other side of a hyperplane. Output length =
   * numTables * (1 + extraProbes), grouped by table.
   */
  def hyperplaneProbes(vec: ArrayData, isFloat: Boolean, numTables: Int,
                       bitsPerTable: Int, extraProbes: Int, seed: Long): ArrayData = {
    val d = vec.numElements()
    val v = new Array[Double](d)
    if (isFloat) {
      val f = vec.toFloatArray()
      var j = 0
      while (j < d) { v(j) = f(j); j += 1 }
    } else {
      val dd = vec.toDoubleArray()
      var j = 0
      while (j < d) { v(j) = dd(j); j += 1 }
    }
    new GenericArrayData(
      hyperplaneProbesArr(v, numTables, bitsPerTable, extraProbes, seed))
  }

  /** Driver-side twin of [[hyperplaneProbes]] over a plain array —
    * used to resolve a single query's probe buckets into literal
    * predicates (the gridKnn-style escape hatch). */
  def hyperplaneProbesArr(v: Array[Double], numTables: Int,
                          bitsPerTable: Int, extraProbes: Int, seed: Long): Array[Int] = {
    val d = v.length
    val planes = planesFor(numTables, bitsPerTable, d, seed)
    val perTable = 1 + extraProbes
    val out = new Array[Int](numTables * perTable)
    val margins = new Array[Double](bitsPerTable)
    val order = new Array[Int](bitsPerTable)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var b = 0
      while (b < bitsPerTable) {
        val base = (t * bitsPerTable + b) * d
        var dot = 0.0
        var j = 0
        while (j < d) { dot += planes(base + j) * v(j); j += 1 }
        if (dot >= 0.0) bucket |= (1 << b)
        margins(b) = math.abs(dot)
        order(b) = b
        b += 1
      }
      // selection-sort bit indices by ascending margin (bitsPerTable is tiny)
      var i = 0
      while (i < bitsPerTable) {
        var m = i; var j2 = i + 1
        while (j2 < bitsPerTable) {
          if (margins(order(j2)) < margins(order(m))) m = j2
          j2 += 1
        }
        val tmp = order(i); order(i) = order(m); order(m) = tmp
        i += 1
      }
      out(t * perTable) = bucket
      var p = 0
      while (p < extraProbes) {
        out(t * perTable + 1 + p) = bucket ^ (1 << order(p % bitsPerTable))
        p += 1
      }
      t += 1
    }
    out
  }

  // ---- cross-engine ASCII tokenizer ------------------------------------
  // The oracle-shared token contract is `lower(text)` split on
  // `[^a-z0-9]+` (runs of ASCII letters/digits, lowercased). One char
  // pass instead of a Java regex + interpreted HOF filter; Spark's
  // lambda functions are CodegenFallback and dominated the text
  // queries' profiles at 5k docs.

  // The inputs below are already simple-lowercased by `lowered`, so
  // this is a pure keep-or-separator gate — re-applying a case mapping
  // here would reintroduce the full-vs-simple divergence.
  @inline private def tokLower(c: Char): Char = if (isTok(c)) c else 0

  /** All tokens of a string, lowercased, in order. */
  def asciiTokens(text: UTF8String): ArrayData = {
    val s = lowered(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val sb = new java.lang.StringBuilder(16)
    var i = 0; val n = s.length
    while (i <= n) {
      val l = if (i < n) tokLower(s.charAt(i)) else 0.toChar
      if (l != 0) sb.append(l)
      else if (sb.length > 0) { out += UTF8String.fromString(sb.toString); sb.setLength(0) }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Distinct tokens of a string (order unspecified). */
  def asciiDistinctTokens(text: UTF8String): ArrayData = {
    val s = lowered(text)
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(16)
    var i = 0; val n = s.length
    while (i <= n) {
      val l = if (i < n) tokLower(s.charAt(i)) else 0.toChar
      if (l != 0) sb.append(l)
      else if (sb.length > 0) { seen.add(sb.toString); sb.setLength(0) }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /**
   * One-pass document length + term frequencies for a small query-term
   * set: (dl, tf per term). Terms must be lowercased [a-z0-9] strings.
   */
  def termFreqs(text: UTF8String, terms: Array[String]): org.apache.spark.sql.catalyst.InternalRow = {
    val s = lowered(text)
    val tf = new Array[Int](terms.length)
    var dl = 0
    var i = 0; val n = s.length
    var start = -1
    while (i <= n) {
      val l = if (i < n) tokLower(s.charAt(i)) else 0.toChar
      if (l != 0) { if (start < 0) start = i }
      else if (start >= 0) {
        dl += 1
        val len = i - start
        var t = 0
        while (t < terms.length) {
          val term = terms(t)
          if (term.length == len) {
            var k = 0
            while (k < len && tokLower(s.charAt(start + k)) == term.charAt(k)) k += 1
            if (k == len) tf(t) += 1
          }
          t += 1
        }
        start = -1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](dl, new GenericArrayData(tf)))
  }

  /** Rolling Rabin-Karp style document fingerprint over tokens. */
  def fingerprint(text: UTF8String, seed: Long): Long = {
    val toks = tokenHashes(lowered(text))
    var h = mix64(seed)
    var i = 0
    while (i < toks.length) { h = mix64(h * 31L + toks(i)); i += 1 }
    h
  }
}

/** text -> deterministic Array[Float] embedding (Cohere stand-in). */
/** splitmix64 finalizer over a long column — the engine's canonical
  * cheap hash for deterministic sampling/splitting. A native
  * expression because Spark's ANSI mode (default in 4.x) rejects the
  * wrapping long multiplies the finalizer needs. */
case class Mix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mix64"

  override protected def nullSafeEval(v: Any): Any =
    TextHash.mix64(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.mix64($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class FakeEmbed(child: Expression, dim: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_embed"

  override protected def nullSafeEval(v: Any): Any =
    TextHash.embed(v.asInstanceOf[UTF8String], dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextHash.embed($s, $dim, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text -> MinHash signature array<long>. */
case class MinHashSig(child: Expression, shingleWords: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(v: Any): Any =
    TextHash.minhash(v.asInstanceOf[UTF8String], shingleWords, numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextHash.minhash($s, $shingleWords, $numHashes, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text -> 64-bit SimHash. */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(v: Any): Any =
    TextHash.simhash(v.asInstanceOf[UTF8String], seed, 3)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextHash.simhash($s, ${seed}L, 3);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** vector -> LSH bucket id per table, array<int>. */
case class HyperplaneBuckets(child: Expression, numTables: Int, bitsPerTable: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    TextHash.hyperplaneBucketsCached(v.asInstanceOf[ArrayData], isFloat, numTables, bitsPerTable, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.hyperplaneBucketsCached($a, $isFloat, $numTables, $bitsPerTable, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text -> array<long> of distinct token-shingle hashes. */
case class ShingleHashesExpr(child: Expression, shingleWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(v: Any): Any =
    TextHash.shingleHashes(v.asInstanceOf[UTF8String], shingleWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextHash.shingleHashes($s, $shingleWords);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text -> winnowing sketch hashes (array<long>, sorted signed-asc). */
case class WinnowSketchExpr(child: Expression, shingleWords: Int, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(v: Any): Any =
    TextHash.winnowSketch(v.asInstanceOf[UTF8String], shingleWords, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextHash.winnowSketch($s, $shingleWords, $window);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text -> struct(n_tokens, n_unique_tokens, total_token_chars, stop_hits). */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_unique_tokens", IntegerType, nullable = false),
    StructField("total_token_chars", LongType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false)))
  override def prettyName: String = "graft_text_stats"

  @transient private lazy val stopHashes: Array[Long] = TextHash.hashWords(stopwords)

  override protected def nullSafeEval(v: Any): Any =
    TextHash.textStats(v.asInstanceOf[UTF8String], stopHashes)

  // Non-codegen (CodegenFallback-style) would break the stage; instead
  // pipe the precomputed stopword hash table through a codegen
  // reference object.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopRef = ctx.addReferenceObj("stopHashes", stopHashes, "long[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextHash.textStats($s, $stopRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** vector -> multi-probe LSH bucket ids (query side), array<int>. */
case class HyperplaneProbes(child: Expression, numTables: Int, bitsPerTable: Int,
                            extraProbes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lsh_probes"

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    TextHash.hyperplaneProbes(v.asInstanceOf[ArrayData], isFloat, numTables,
      bitsPerTable, extraProbes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.hyperplaneProbes($a, $isFloat, $numTables, $bitsPerTable, $extraProbes, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text -> array<string> of lowercased [a-z0-9] tokens, in order. */
case class AsciiTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override protected def nullSafeEval(v: Any): Any =
    TextHash.asciiTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextHash.asciiTokens($s);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text -> array<string> of distinct lowercased tokens. */
case class AsciiDistinctTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_distinct_tokens"

  override protected def nullSafeEval(v: Any): Any =
    TextHash.asciiDistinctTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextHash.asciiDistinctTokens($s);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text -> struct(dl int, tfs array<int>): document length + term
  * frequency per query term, one tokenizer pass. */
case class TermFreqsExpr(child: Expression, terms: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("dl", IntegerType, nullable = false),
    StructField("tfs", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_term_freqs"

  @transient private lazy val termArr: Array[String] = terms.toArray

  override protected def nullSafeEval(v: Any): Any =
    TextHash.termFreqs(v.asInstanceOf[UTF8String], termArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("terms", termArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextHash.termFreqs($s, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text -> rolling-hash fingerprint (long). */
case class DocFingerprint(child: Expression, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(v: Any): Any =
    TextHash.fingerprint(v.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextHash.fingerprint($s, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
