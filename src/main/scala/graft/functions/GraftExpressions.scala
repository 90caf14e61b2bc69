package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths the higher-order-function
  * formulations interpret one lambda call per element: polynomial text
  * hashing and dense-vector math. Each is a single JVM loop invoked from
  * generated code (`defineCodeGen`), so the surrounding projection stays
  * inside whole-stage codegen instead of falling back to interpreted
  * `transform`/`aggregate` trees.
  *
  * Semantics are BIT-IDENTICAL to the HOF versions they replace (same
  * left-to-right fold order, same integer formulas), so the DuckDB oracles
  * in [[graft.SparkEntry]] verify them value-for-value.
  */
object GraftExprs {

  val Prime = 1000000007L

  /** fold over code points: (acc*31 + cp) mod P — the engine-portable hash. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % Prime
      i += Character.charCount(cp)
    }
    h
  }

  /** Jaro-Winkler similarity, conformant with DuckDB's
    * `jaro_winkler_similarity` (probed empirically, the cross-engine
    * contract the er4 gate row hash-checks): BYTE-level over the UTF-8
    * encoding (DuckDB measured 0.7778 on 'éa'/'éb' — the 3-byte
    * interpretation, not codepoints), match window ⌊max(|a|,|b|)/2⌋ − 1
    * with no floor (window 0 still matches same positions; 'ab'/'ba'
    * measured 0.0), transpositions as the FLOORED half of misaligned match pairs (probed: a 3-mismatch cycle scores (m−1)/m),
    * jaro = (m/|a| + m/|b| + (m − t/2)/m)/3 left-associated, and the
    * CLASSIC Winkler prefix boost applied only above the 0.7 threshold
    * (probed: 'abcdef'/'abzzzz' keeps plain jaro) with l ≤ 4 common
    * prefix bytes and p = 0.1. Empty strings score 0. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes
    val y = b.getBytes
    val la = x.length
    val lb = y.length
    if (la == 0 || lb == 0) return 0.0
    if (java.util.Arrays.equals(x, y)) return 1.0
    val w = math.max(la, lb) / 2 - 1
    val xm = new Array[Boolean](la)
    val ym = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - w)
      val hi = math.min(lb - 1, i + w)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!ym(j) && x(i) == y(j)) {
          xm(i) = true; ym(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (xm(i)) {
        while (!ym(k)) k += 1
        if (x(i) != y(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // transposition HALVES floor to integer (probed: a 3-mismatch cycle
    // scores (m−1)/m in DuckDB, not (m−1.5)/m)
    val jaro = (md / la + md / lb + (md - (t / 2).toDouble) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lmax = math.min(4, math.min(la, lb))
    while (l < lmax && x(l) == y(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** TRUE (unrestricted) Damerau-Levenshtein distance, conformant with
    * DuckDB's `damerau_levenshtein` (probed: 'CA'→'ABC' = 2 — the
    * unrestricted variant, where OSA answers 3; byte-level like
    * [[jaroWinkler]] — 'éa'→'aé' measured 2, not the codepoint answer 1).
    * Lowrance–Wagner DP with the 256-entry last-occurrence table;
    * O(|a|·|b|) time and space per row — an edit-distance RECHECK for
    * bounded candidates, not a corpus-scan primitive. */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Long = {
    val x = a.getBytes
    val y = b.getBytes
    val la = x.length
    val lb = y.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val inf = la + lb
    val h = Array.ofDim[Int](la + 2, lb + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= la) { h(i + 1)(0) = inf; h(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { h(0)(j + 1) = inf; h(1)(j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = da(y(j - 1) & 0xFF)
        val j1 = db
        val cost = if (x(i - 1) == y(j - 1)) { db = j; 0 } else 1
        var best = h(i)(j) + cost                    // substitution / match
        val ins = h(i + 1)(j) + 1                     // insertion
        if (ins < best) best = ins
        val del = h(i)(j + 1) + 1                     // deletion
        if (del < best) best = del
        val tr = h(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1) // transposition
        if (tr < best) best = tr
        h(i + 1)(j + 1) = best
        j += 1
      }
      da(x(i - 1) & 0xFF) = i
      i += 1
    }
    h(la + 1)(lb + 1).toLong
  }

  /** Σ (double)a[i]·(double)b[i], strict left-to-right. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Space-only trim matching SQL `TRIM(text)` exactly: Spark's and DuckDB's
    * TRIM strip only ' ', while Java `String.trim` strips every char <=
    * U+0020 (\n, \t, \r) — a silent tokenization divergence on documents
    * with leading/trailing control whitespace. */
  def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    if (from == 0 && to == s.length) s else s.substring(from, to)
  }

  /** Unicode NFC canonical composition (java.text.Normalizer) — the
    * standard text-cleaning step that collapses decomposed sequences
    * (e + U+0301 → é) so dedup/hash keys don't split on byte-level
    * representation of the same text. NFC only (canonical); NFKC's
    * compatibility foldings are intentionally NOT applied — they are
    * lossy (① → 1) and their tables drift more across Unicode versions. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan; most real text
    // is already NFC and skips the allocation entirely
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** sqrt(Σ ((double)a[i])²), strict left-to-right. */
  def normF(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0d
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** One pass over a document's whitespace tokens: (n_tokens,
    * dup_token_frac, top_bigram_frac) — the Gopher repetition metrics.
    * Token split mirrors `split(trim(text), ' +')` (trimmed input has no
    * leading/trailing empties; the empty string yields the single empty
    * token, as in Spark). Fractions divide exact integer counts and round
    * half-up at 7 dp exactly like Spark's `round`, so the groupBy-based
    * DuckDB oracle verifies values unchanged. */
  def repStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    def round7(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(7, java.math.RoundingMode.HALF_UP).doubleValue()
    val toks = trimSpaces(text.toString).split(" +", -1)
    val n = toks.length
    val tc = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < n) { tc.merge(toks(i), 1, Integer.sum(_, _)); i += 1 }
    var singles = 0
    tc.values.forEach(c => if (c == 1) singles += 1)
    val nRep = n - singles
    var top = 0L
    var nBg = 0
    if (n >= 2) {
      nBg = n - 1
      val bc = new java.util.HashMap[String, Integer]()
      var j = 0
      while (j < n - 1) { bc.merge(toks(j) + " " + toks(j + 1), 1, Integer.sum(_, _)); j += 1 }
      bc.values.forEach(c => if (c.longValue() > top) top = c.longValue())
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      n.toLong,
      round7(nRep.toDouble / n.toDouble),
      round7(top.toDouble / math.max(nBg, 1).toDouble)))
  }

  /** Distinct word-n-gram 60-bit hashes of one document in a single JVM
    * pass: tokenize (split-on-space-runs of the trimmed text, as
    * `split(trim(text), ' +')`), hash each n-gram as
    * polyHash(g) + polyHash(reverse(g))·2^30, dedupe. Values are
    * bit-identical to [[graft.operators.Dedup.shingleHashes]]'s `h` column
    * — the per-document SET the whole MinHash pipeline consumes — but
    * computed without the corpus-wide (doc_id, h) DISTINCT shuffle. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = trimSpaces(text.toString).split(" +", -1)
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val g = sb.toString
      val h1 = polyHash(UTF8String.fromString(g))
      val h2 = polyHash(UTF8String.fromString(new java.lang.StringBuilder(g).reverse.toString))
      seen.add(h1 + h2 * (1L << 30))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  /** POSITIONAL word-n-gram hashes: same tokenization and 60-bit hash as
    * [[shingleHashes]] but emitted IN ORDER, one per gram start position
    * (no dedup) — element i is the hash of the gram starting at token i
    * (0-based). The anchor stream for exact substring dedup: a duplicated
    * run of m ≥ n tokens at offsets (i, j) is exactly m−n+1 consecutive
    * equal hashes at aligned positions. */
  def shingleHashSeq(text: UTF8String, n: Int): ArrayData = {
    val toks = trimSpaces(text.toString).split(" +", -1)
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val g = sb.toString
      val h1 = polyHash(UTF8String.fromString(g))
      val h2 = polyHash(UTF8String.fromString(new java.lang.StringBuilder(g).reverse.toString))
      out(i) = h1 + h2 * (1L << 30)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All-k MinHash minima over a per-document shingle-hash array — the
    * per-row twin of [[MinHashAgg]] (same permutation formula on
    * hp = h mod P), with no aggregation shuffle at all. */
  def minhashFromArr(arr: ArrayData, k: Int): ArrayData = {
    val buf = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val hp = arr.getLong(i) % Prime
      var j = 0
      while (j < k) {
        val a = (j.toLong * 2654435761L) % Prime + 1L
        val b = (j.toLong * 40503L + 7L) % Prime
        val p = (a * hp + b) % Prime
        if (p < buf(j)) buf(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(buf)
  }

  /** FastText-style hashed-feature linear classification of one document in
    * a single JVM pass: whitespace tokens (space-only trim — the SQL TRIM
    * twin), unigram features `"u:" + tok` and adjacent-bigram features
    * `"b:" + tok1 + " " + tok2`, each hashed into `dims` buckets with the
    * nonlinear sample-key mix ((h² + h) mod P — raw polyHash residues over
    * near-identical strings form the base-31 lattice, see
    * [[graft.functions.TextHash.sampleKey]]), and scored against a
    * deterministic integer weight table
    * w(fid) = ((fid · 2654435761) mod 2001) − 1000 ∈ [−1000, 1000].
    * Returns [n_features, Σ weights] as a 2-element long array — one
    * tokenize pass serves both outputs. Every step is exact integer
    * arithmetic (h < P ⇒ h² + h < 2^63; fid < dims ≤ 4096 ⇒
    * fid · 2654435761 < 2^44), so a SQL oracle reproduces the score
    * bit-for-bit. Occurrences vote independently (a repeated feature adds
    * its weight again) — the standard bag-of-features linear model shape. */
  def linearClassify(text: UTF8String, dims: Int): ArrayData = {
    val toks = trimSpaces(text.toString).split(" +", -1)
    var n = 0L
    var score = 0L
    def add(f: String): Unit = {
      val h = polyHash(UTF8String.fromString(f))
      val fid = ((h * h + h) % Prime) % dims
      n += 1L
      score += ((fid * 2654435761L) % 2001L) - 1000L
    }
    var i = 0
    while (i < toks.length) { add("u:" + toks(i)); i += 1 }
    i = 0
    while (i < toks.length - 1) { add("b:" + toks(i) + " " + toks(i + 1)); i += 1 }
    new GenericArrayData(Array(n, score))
  }

  /** Σ a[i]·b[i] over two long arrays — exact (order-independent) integer
    * dot product, the scoring kernel for quantized-code vectors (SQ8). */
  def dotL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** SimHash signature of one document in a single JVM pass: tokenize, hash
    * each token (60-bit, multiset — unlike shingles, repeats vote again),
    * vote per bit, collapse to the signature. Bit-identical to the
    * token-explode + [[SimHashAgg]] pipeline. */
  def simhashFromText(text: UTF8String, nBits: Int): Long = {
    val toks = trimSpaces(text.toString).split(" +", -1)
    val cnt = new Array[Int](nBits)
    var i = 0
    while (i < toks.length) {
      val h = polyHash(UTF8String.fromString(toks(i))) +
        polyHash(UTF8String.fromString(new java.lang.StringBuilder(toks(i)).reverse.toString)) * (1L << 30)
      var j = 0
      while (j < nBits) { cnt(j) += (if (((h >> j) & 1L) != 0L) 1 else -1); j += 1 }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < nBits) { if (cnt(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  /** nBits deterministic hyperplane projections of a float vector —
    * identical formula to [[graft.operators.Similarity]]'s SQL oracle:
    * h(b,d) = (((b·104729 + d·7919 + 12345)²) mod 1000003)/1000003 − 0.5
    * (the quadratic mix decorrelates hyperplanes: a LINEAR index map makes
    * every hyperplane a small shift of the same sawtooth sequence —
    * measured 60%% of real vectors landing in 2 of 256 buckets). */
  def hyperProj(e: ArrayData, nBits: Int): ArrayData = {
    val n = e.numElements()
    val out = new Array[Double](nBits)
    var b = 0
    while (b < nBits) {
      var s = 0.0d
      var d = 0
      while (d < n) {
        val v = b.toLong * 104729L + d.toLong * 7919L + 12345L
        val m = (v * v) % 1000003L
        s += e.getFloat(d).toDouble * (m.toDouble / 1000003.0d - 0.5d)
        d += 1
      }
      out(b) = s
      b += 1
    }
    new GenericArrayData(out)
  }

  /** LSH bucket id: Σ_{b: hyperProj(e)[b] > 0} 2^b, folded in the same pass
    * as the projections — value-identical to aggregating [[hyperProj]]'s
    * output through `when(p > 0) 2^b`, without materializing the projection
    * array or running interpreted `zip_with`/`aggregate` lambdas per row. */
  def hyperBucket(e: ArrayData, nBits: Int): Long = {
    val n = e.numElements()
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var s = 0.0d
      var d = 0
      while (d < n) {
        val v = b.toLong * 104729L + d.toLong * 7919L + 12345L
        val m = (v * v) % 1000003L
        s += e.getFloat(d).toDouble * (m.toDouble / 1000003.0d - 0.5d)
        d += 1
      }
      if (s > 0.0d) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  /** [[hyperBucket]] of the CENTERED vector e − m (m: array<double>, the
    * corpus's quantized global mean): sign bits of
    * Σ_d (e[d] − m[d])·w(b,d), same hyperplane weights. Centering balances
    * the sign bits when embeddings have a dominant direction — measured on
    * the 100k fixture, uncentered bucketing collapsed 60% of vectors into 2
    * of 256 buckets (Σ bucket² ≈ 1.9G pairs); centered, bucket population
    * follows cluster structure. */
  def hyperBucketC(e: ArrayData, m: ArrayData, nBits: Int): Long = {
    val n = math.min(e.numElements(), m.numElements())
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var s = 0.0d
      var d = 0
      while (d < n) {
        val v = b.toLong * 104729L + d.toLong * 7919L + 12345L
        val w = (v * v) % 1000003L
        s += (e.getFloat(d).toDouble - m.getDouble(d)) * (w.toDouble / 1000003.0d - 0.5d)
        d += 1
      }
      if (s > 0.0d) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  /** Σ (double)a[i]·b[i] where a is array<float>, b array<double> —
    * left-to-right, for query-vs-centroid scoring. */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }

  /** sqrt(Σ a[i]²) over array<double>, strict left-to-right. */
  def normD(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0d
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Deterministic ±1 sign random projection (Achlioptas-style) of an
    * array<float> embedding down to `kOut` quantized-BIGINT components:
    * out[i] = Σ_j trunc(a[j]·2^20) · sign(i,j), with
    * sign(i,j) = +1 iff ((i·131 + j + 17)² mod 97) < 48. The index mix is
    * NONLINEAR (square before mod — a linear map would make every output
    * row a shifted copy of one sawtooth, per the LSH hyperplane lesson)
    * and the quantize-then-integer-sum keeps the result order-independent
    * and bit-identical in the SQL oracle (no float fold ordering). Bound:
    * |out[i]| ≤ D·2^20·max|a| — no overflow for any real embedding. */
  def randProj(a: ArrayData, kOut: Int): ArrayData = {
    val d = a.numElements()
    val q = new Array[Long](d)
    var j = 0
    while (j < d) {
      q(j) = (a.getFloat(j).toDouble * 1048576.0).toLong // trunc toward zero = SQL trunc()
      j += 1
    }
    val out = new Array[Long](kOut)
    var i = 0
    while (i < kOut) {
      var s = 0L
      j = 0
      while (j < d) {
        val m = i * 131 + j + 17
        s += (if ((m * m) % 97 < 48) q(j) else -q(j))
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints (Schleimer et al., MOSS) in one O(len) pass:
    * rolling-polynomial k-gram hashes (h′ = (h − cp_out·31^(k−1))·31 + cp_in
    * mod P — value-identical to [[polyHash]] of each k-char substring),
    * sliding-window-of-w minima via a monotonic deque, first-occurrence
    * dedup. Replaces the HOF formulation's O(len·k) re-hash per position and
    * O(len·w) per-window array_min. Fewer than w k-grams → all distinct
    * hashes (the document is shorter than one window); no k-grams → empty.
    * Positions are code points, matching polyHash and DuckDB substr. */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val nGrams = cps.length - (k - 1)
    if (nGrams < 1) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](nGrams)
    var pw = 1L // 31^(k-1) mod P
    var t = 1
    while (t < k) { pw = (pw * 31L) % Prime; t += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = (h * 31L + cps(i)) % Prime; i += 1 }
    hs(0) = h
    var j = 1
    while (j < nGrams) {
      h = (h - (cps(j - 1) * pw) % Prime + Prime) % Prime
      h = (h * 31L + cps(j + k - 1)) % Prime
      hs(j) = h
      j += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (nGrams < w) {
      var p = 0
      while (p < nGrams) { seen.add(hs(p)); p += 1 }
    } else {
      // monotonic deque of indices whose hashes increase front→back
      val dq = new Array[Int](nGrams)
      var head = 0
      var tail = 0 // exclusive
      var p = 0
      while (p < nGrams) {
        while (tail > head && hs(dq(tail - 1)) >= hs(p)) tail -= 1
        dq(tail) = p; tail += 1
        if (dq(head) <= p - w) head += 1
        if (p >= w - 1) seen.add(hs(dq(head)))
        p += 1
      }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Binary-quantization code: bit d of word ⌊d/64⌋ is set iff
    * e[d] > m[d] (STRICT — a tie quantizes to 0, the same double compare a
    * SQL oracle replays on identical values). array<float> × array<double>
    * → array<bigint> of ⌈dim/64⌉ packed words, one pass, no intermediate
    * array — the 1-bit/dim encode of binary-quantized ANN (32× smaller
    * than float32; Hamming over the words is the candidate metric). */
  def signPack(e: ArrayData, m: ArrayData): ArrayData = {
    val n = math.min(e.numElements(), m.numElements())
    val out = new Array[Long]((n + 63) / 64)
    var d = 0
    while (d < n) {
      if (e.getFloat(d).toDouble > m.getDouble(d)) out(d >> 6) |= (1L << (d & 63))
      d += 1
    }
    new GenericArrayData(out)
  }

  /** Greedy longest-match-first segmentation count (WordPiece inference,
    * Wu et al. arXiv:1609.08144 §4.1): from the left, repeatedly consume
    * the LONGEST vocabulary piece prefixing the remainder; a position no
    * piece covers consumes one char as UNK. Returns the token count.
    * Deterministic for any vocabulary; when the vocab contains every
    * single character (the caller's construction) the UNK branch is
    * unreachable, which is what lets a SQL oracle replay the recursion
    * without the UNK rule. */
  def greedySegCount(word: UTF8String, pieces: ArrayData): Long = {
    val w = word.toString
    val n = pieces.numElements()
    val set = new java.util.HashSet[String](n * 2)
    var maxLen = 1
    var i = 0
    while (i < n) {
      val p = pieces.getUTF8String(i).toString
      set.add(p)
      if (p.length > maxLen) maxLen = p.length
      i += 1
    }
    var pos = 0
    var tokens = 0L
    while (pos < w.length) {
      var l = math.min(maxLen, w.length - pos)
      var matched = 1 // UNK fallback: consume one char
      var found = false
      while (l >= 1 && !found) {
        if (set.contains(w.substring(pos, pos + l))) { matched = l; found = true }
        l -= 1
      }
      pos += matched
      tokens += 1L
    }
    tokens
  }

  /** Hamming distance between two packed sign-bit codes: Σ popcount(a⊕b)
    * over the word arrays (array<bigint> × array<bigint> → bigint). */
  def hammingWords(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    s
  }
}

/** polyHash as a unary expression: string → bigint. */
case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    GraftExprs.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftExprs.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

/** Unicode NFC normalization: string → string (canonical composition). */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    GraftExprs.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftExprs.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** Left-to-right double dot product of two array<float> columns. */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftExprs.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}

/** Jaro-Winkler similarity of two string columns — DuckDB-conformant
  * semantics (see [[GraftExprs.jaroWinkler]]); codegen, null-safe. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftExprs.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerExpr =
    copy(left = l, right = r)
}

/** True Damerau-Levenshtein distance of two string columns — DuckDB-
  * conformant semantics (see [[GraftExprs.damerauLevenshtein]]). */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.damerauLevenshtein(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftExprs.damerauLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshteinExpr =
    copy(left = l, right = r)
}

/** L2 norm of an array<float> column (double accumulation). */
case class L2NormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any): Any =
    GraftExprs.normF(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftExprs.normF($a)")
  override protected def withNewChildInternal(newChild: Expression): L2NormExpr =
    copy(child = newChild)
}

/** All nBits hyperplane projections in one pass: array<float> → array<double>. */
case class HyperProjExpr(child: Expression, nBits: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    GraftExprs.hyperProj(a.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftExprs.hyperProj($a, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): HyperProjExpr =
    copy(child = newChild)
}

/** LSH bucket of an array<float> under the deterministic hyperplanes:
  * array<float> → bigint, one codegen call, no intermediate array. */
case class HyperBucketExpr(child: Expression, nBits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any): Any =
    GraftExprs.hyperBucket(a.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftExprs.hyperBucket($a, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): HyperBucketExpr =
    copy(child = newChild)
}

/** Centered LSH bucket id: [[GraftExprs.hyperBucketC]] of (embedding, mean). */
case class HyperBucketCExpr(left: Expression, right: Expression, nBits: Int)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.hyperBucketC(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftExprs.hyperBucketC($a, $b, $nBits)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HyperBucketCExpr =
    copy(left = newLeft, right = newRight)
}

/** Packed sign-bit code of an embedding against the corpus mean:
  * (array<float>, array<double>) → array<bigint> ([[GraftExprs.signPack]]). */
case class SignPackExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.signPack(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftExprs.signPack($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SignPackExpr =
    copy(left = l, right = r)
}

/** Greedy longest-match segmentation count: (string, array<string>) →
  * bigint ([[GraftExprs.greedySegCount]]). */
case class GreedySegCountExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.greedySegCount(a.asInstanceOf[UTF8String], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftExprs.greedySegCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GreedySegCountExpr =
    copy(left = l, right = r)
}

/** Hamming distance of two packed codes: (array<bigint>, array<bigint>) →
  * bigint ([[GraftExprs.hammingWords]]). */
case class HammingWordsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.hammingWords(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftExprs.hammingWords($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingWordsExpr =
    copy(left = l, right = r)
}

/** Left-to-right dot of array<float> × array<double> (query vs centroid). */
case class DotFDExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftExprs.dotFD($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFDExpr =
    copy(left = l, right = r)
}

/** Winnowing fingerprint set of a string: string → array<bigint>. */
case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    GraftExprs.winnow(a.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftExprs.winnow($a, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

/** Per-document distinct shingle-hash set as one generated-code call. */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    GraftExprs.shingleHashes(a.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftExprs.shingleHashes($a, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** Per-document POSITIONAL shingle-hash sequence (ordered, undeduped). */
case class ShingleHashSeqExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    GraftExprs.shingleHashSeq(a.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftExprs.shingleHashSeq($a, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashSeqExpr =
    copy(child = newChild)
}

/** Per-document all-k MinHash signature from its shingle-hash array. */
case class MinHashArrExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    GraftExprs.minhashFromArr(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftExprs.minhashFromArr($a, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashArrExpr =
    copy(child = newChild)
}

/** Per-document SimHash signature straight from the text column. */
case class SimHashTextExpr(child: Expression, nBits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any): Any =
    GraftExprs.simhashFromText(a.asInstanceOf[UTF8String], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftExprs.simhashFromText($a, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashTextExpr =
    copy(child = newChild)
}

/** Repetition metrics over a text column in one generated-code call:
  * struct(n_tokens, dup_token_frac, top_bigram_frac). */
case class RepStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("dup_token_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))
  override protected def nullSafeEval(a: Any): Any =
    GraftExprs.repStats(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftExprs.repStats($a)")
  override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
    copy(child = newChild)
}

/** Sign-random-projection of array<float> to kOut quantized components. */
case class RandProjExpr(child: Expression, kOut: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    GraftExprs.randProj(a.asInstanceOf[ArrayData], kOut)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftExprs.randProj($a, $kOut)")
  override protected def withNewChildInternal(newChild: Expression): RandProjExpr =
    copy(child = newChild)
}

/** L2 norm of an array<double> column. */
case class L2NormDExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any): Any =
    GraftExprs.normD(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftExprs.normD($a)")
  override protected def withNewChildInternal(newChild: Expression): L2NormDExpr =
    copy(child = newChild)
}

/** Hashed-feature linear classifier over a text column: returns
  * [n_features, score] as array<long> (see [[GraftExprs.linearClassify]]).
  * One generated call per row — tokens, feature hashes and the weight fold
  * never leave the row. */
case class LinearClassifyExpr(child: Expression, dims: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    GraftExprs.linearClassify(input.asInstanceOf[UTF8String], dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftExprs.linearClassify($c, $dims)")
  override protected def withNewChildInternal(newChild: Expression): LinearClassifyExpr =
    copy(child = newChild)
}

/** Exact integer dot product of two array<long> columns (SQ8 code scoring). */
case class DotLongExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.dotL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftExprs.dotL($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLongExpr =
    copy(left = l, right = r)
}

object GraftColumns {
  def polyHash(c: Column): Column =
    ColumnBridge.column(PolyHashExpr(ColumnBridge.expression(c)))
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(c)))
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def damerauLevenshtein(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshteinExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def normF(a: Column): Column =
    ColumnBridge.column(L2NormExpr(ColumnBridge.expression(a)))
  def hyperProj(e: Column, nBits: Int): Column =
    ColumnBridge.column(HyperProjExpr(ColumnBridge.expression(e), nBits))
  def hyperBucket(e: Column, nBits: Int): Column =
    ColumnBridge.column(HyperBucketExpr(ColumnBridge.expression(e), nBits))
  def dotFD(a: Column, b: Column): Column =
    ColumnBridge.column(DotFDExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def normD(a: Column): Column =
    ColumnBridge.column(L2NormDExpr(ColumnBridge.expression(a)))
  def randProj(a: Column, kOut: Int): Column =
    ColumnBridge.column(RandProjExpr(ColumnBridge.expression(a), kOut))
  def winnowFps(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(text), k, w))
  def repStats(text: Column): Column =
    ColumnBridge.column(RepStatsExpr(ColumnBridge.expression(text)))
  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(text), n))
  def shingleHashSeq(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashSeqExpr(ColumnBridge.expression(text), n))
  def minhashArr(hs: Column, k: Int): Column =
    ColumnBridge.column(MinHashArrExpr(ColumnBridge.expression(hs), k))
  def simhashText(text: Column, nBits: Int): Column =
    ColumnBridge.column(SimHashTextExpr(ColumnBridge.expression(text), nBits))
  def hyperBucketC(e: Column, m: Column, nBits: Int): Column =
    ColumnBridge.column(HyperBucketCExpr(ColumnBridge.expression(e), ColumnBridge.expression(m), nBits))
  def linearClassify(text: Column, dims: Int): Column =
    ColumnBridge.column(LinearClassifyExpr(ColumnBridge.expression(text), dims))
  def dotL(a: Column, b: Column): Column =
    ColumnBridge.column(DotLongExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def signPack(e: Column, m: Column): Column =
    ColumnBridge.column(SignPackExpr(ColumnBridge.expression(e), ColumnBridge.expression(m)))
  def greedySegCount(word: Column, pieces: Column): Column =
    ColumnBridge.column(GreedySegCountExpr(ColumnBridge.expression(word), ColumnBridge.expression(pieces)))
  def hammingWords(a: Column, b: Column): Column =
    ColumnBridge.column(HammingWordsExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
