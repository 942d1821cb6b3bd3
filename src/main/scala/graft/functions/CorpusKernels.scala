package graft.functions

import scala.util.hashing.MurmurHash3

/** Static kernels for corpus-scale dedup / text-analysis operators
  * (SURVEY.md §4 note 3; BASELINE.json north star). Pure JVM functions with
  * static forwarders so the Catalyst expressions in [[graft.functions]]
  * codegen direct calls.
  *
  * All hashing is seeded MurmurHash3 (public algorithm, stable across JVMs
  * and executors) — determinism is load-bearing: signatures computed on
  * different executors must agree, and re-runs must reproduce buckets.
  */
object CorpusKernels {

  /** Sort + in-place distinct, shared by the shingle kernels. */
  private def sortedDistinct(out: Array[Int]): Array[Int] = {
    java.util.Arrays.sort(out)
    var w = 0
    var i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  /** [[sortedDistinct]] for the md5-seam Long lattices. */
  private def sortedDistinct(out: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(out)
    var w = 0
    var i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  // --- shingling + MinHash ----------------------------------------------

  /** Character k-shingle hash set (sorted, distinct) of a string. */
  def shingleHashes(text: String, k: Int): Array[Int] = {
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = MurmurHash3.stringHash(text.substring(i, i + k), 0x9747b28c)
      i += 1
    }
    sortedDistinct(out)
  }

  /** [[shingleHashes]] with md5-derived gram hashes ([[md5Hash32]],
    * unsigned 32-bit values carried in Longs) — the minhash family's
    * certification seam: a SQL engine with `md5()` recomputes the SAME
    * hash per k-gram and dedups by IT, so op and oracle operate on
    * literally identical shingle sets (collisions collapse identically
    * on both sides — a construction, not a probability argument).
    * Production shingling stays on the MurmurHash3 [[shingleHashes]].
    */
  def shingleHashesMd5(text: String, k: Int): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = md5Hash32(text.substring(i, i + k))
      i += 1
    }
    sortedDistinct(out)
  }

  /** Word n-gram shingle hashes (whitespace tokens), sorted distinct. */
  def wordShingleHashes(text: String, n: Int): Array[Int] = {
    if (text == null) return Array.empty
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.length < n) return Array.empty
    val m = words.length - n + 1
    val out = new Array[Int](m)
    var i = 0
    while (i < m) {
      out(i) = MurmurHash3.orderedHash(
        words.iterator.slice(i, i + n).toSeq, 0x85ebca6b).toInt
      i += 1
    }
    sortedDistinct(out)
  }

  /** [[wordShingleHashes]] with md5-derived gram hashes — the word-gram
    * certification seam ([[shingleHashesMd5]]'s recipe): each n-gram is
    * the single-space join of its words and its hash is [[md5Hash32]],
    * which a SQL oracle recomputes verbatim (`md5(w1 || ' ' || w2 ||
    * ' ' || w3)`) and dedups/joins by — identical gram sets on both
    * sides by construction. Production keeps the MurmurHash3 default.
    */
  def wordShingleHashesMd5(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.empty
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.length < n) return Array.empty
    val m = words.length - n + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = md5Hash32(words.slice(i, i + n).mkString(" "))
      i += 1
    }
    sortedDistinct(out)
  }

  private final val MersennePrime = (1L << 61) - 1

  /** splitmix64 finalizer (public-domain avalanche mix) — a full-period
    * 64-bit bijection; XORing a per-function seed before mixing yields an
    * effectively random permutation per hash function, which is exactly the
    * MinHash requirement (P[min agree] = Jaccard). A linear (a·x+b) mod p
    * with small coefficients is NOT acceptable here: it is order-preserving
    * on most of the domain and collapses agreement (found the hard way).
    */
  private def mix64(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature over the shingle set: numHashes independent
    * pseudo-permutations h_i(x) = mix64(x ^ seed_i).
    */
  def minHashSignature(text: String, k: Int, numHashes: Int): Array[Long] = {
    val shingles = shingleHashes(text, k)
    val sig = new Array[Long](numHashes)
    var h = 0
    while (h < numHashes) {
      val seed = mix64(0x9e3779b97f4a7c15L * (h + 1))
      var best = Long.MaxValue
      var i = 0
      while (i < shingles.length) {
        val x = shingles(i).toLong & 0xffffffffL
        val v = mix64(x ^ seed)
        if (v < best) best = v
        i += 1
      }
      sig(h) = if (shingles.isEmpty) -1L else best
      h += 1
    }
    sig
  }

  /** Jaccard similarity of the two strings' char-k-shingle sets. */
  def jaccardShingles(a: String, b: String, k: Int): Double = {
    val sa = shingleHashes(a, k)
    val sb = shingleHashes(b, k)
    jaccardSorted(sa, sb)
  }

  /** Jaccard similarity of word-n-gram sets. */
  def jaccardWordShingles(a: String, b: String, n: Int): Double = {
    jaccardSorted(wordShingleHashes(a, n), wordShingleHashes(b, n))
  }

  /** Jaccard of two pre-sorted distinct int arrays (merge intersection) —
    * the verify step of MinHash LSH without re-hashing any text.
    */
  def jaccardSortedArrays(sa: Array[Int], sb: Array[Int]): Double =
    jaccardSorted(sa, sb)

  /** Fraction of agreeing positions of two MinHash signatures — the
    * unbiased Jaccard estimate (σ ≈ sqrt(j(1-j)/H)).
    */
  def sigAgreement(a: Array[Long], b: Array[Long]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }

  /** Sorted distinct char-k-shingle hashes — precomputed once per doc and
    * carried through the LSH join so verification is a merge, not a re-hash.
    */
  def sortedShingles(text: String, k: Int): Array[Int] = shingleHashes(text, k)

  private def jaccardSorted(sa: Array[Int], sb: Array[Int]): Double = {
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < sa.length && j < sb.length) {
      if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
      else if (sa(i) < sb(j)) i += 1
      else j += 1
    }
    inter.toDouble / (sa.length + sb.length - inter)
  }

  /** [[jaccardSortedArrays]] over Long arrays — the md5-seam shingle
    * sets' verify step ([[shingleHashesMd5]]).
    */
  def jaccardSortedLongArrays(sa: Array[Long], sb: Array[Long]): Double = {
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < sa.length && j < sb.length) {
      if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
      else if (sa(i) < sb(j)) i += 1
      else j += 1
    }
    inter.toDouble / (sa.length + sb.length - inter)
  }

  // --- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over whitespace word hashes (Charikar): each word votes
    * its hash bits weight +1/-1; sign of the tally is the output bit.
    */
  def simHash(text: String): Long = {
    if (text == null) return 0L
    val counts = new Array[Int](64)
    val it = text.split("\\s+").iterator.filter(_.nonEmpty)
    while (it.hasNext) {
      val w = it.next()
      val h = (MurmurHash3.stringHash(w, 0xc2b2ae35).toLong << 32) |
        (MurmurHash3.stringHash(w, 0x27d4eb2f).toLong & 0xffffffffL)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  // --- md5 certification-seam hashes --------------------------------------

  private val md5Digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 8 bytes of md5(UTF-8 s) as the signed 64-bit value
    * `(hi32 << 32) | lo32` — exactly what any engine with `md5()`
    * reconstructs from the first 16 hex digits (two 8-digit halves, the
    * repo's standard hashSplit/fimTransform lattice widened to 64 bits).
    * Certification-seam hash: NOT for production hot paths (MurmurHash3
    * is ~10× cheaper); it exists so signature pipelines can be replayed
    * bit-for-bit in a cross-engine SQL oracle.
    */
  def md5Hash64(s: String): Long = {
    val d = md5Digest.get(); d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
  }

  /** First 4 md5 bytes (= first 8 hex digits) as an UNSIGNED value in
    * [0, 2^32), carried in a Long — the winnowing seam's gram hash
    * ([[winnowPositionsMd5]]): unsigned order matches the SQL replay's
    * BIGINT order directly, no sign fix-up.
    */
  def md5Hash32(s: String): Long = {
    val d = md5Digest.get(); d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** SimHash64 with md5-derived word hashes — [[simHash]]'s STAGED-FORM
    * certification seam: the identical vote/sign algorithm, but each
    * word's 64-bit hash is [[md5Hash64]] and the tokenizer is the
    * explicit class `[ \t\n\x0B\f\r]+` (the same set Java's `\s` matches,
    * spelled out so the oracle's RE2 class is character-identical), so a
    * SQL engine with `md5()` replays the signature bit-for-bit.
    * Production near-dup stays on the MurmurHash3 [[simHash]].
    */
  def simHashMd5(text: String): Long = {
    if (text == null) return 0L
    val counts = new Array[Int](64)
    val it = text.split("[ \\t\\n\\x0B\\f\\r]+").iterator.filter(_.nonEmpty)
    while (it.hasNext) {
      val h = md5Hash64(it.next())
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  // --- rolling-hash document fingerprint ---------------------------------

  /** a·b mod 2^61-1 without overflow: fold the 128-bit product with
    * 2^64 ≡ 8 (mod p).
    */
  private def mulmodM61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & MersennePrime) + ((hi << 3) | (lo >>> 61))
    r = (r & MersennePrime) + (r >>> 61)
    if (r >= MersennePrime) r - MersennePrime else r
  }

  /** Polynomial rolling hash (base-257 mod 2^61-1) of the normalized text —
    * a whole-document fingerprint robust to whitespace variation.
    */
  def fingerprint(text: String): Long = {
    if (text == null) return 0L
    var h = 0L
    var i = 0
    var lastSpace = true
    while (i < text.length) {
      val c0 = text.charAt(i)
      val isSpace = Character.isWhitespace(c0)
      // collapse whitespace runs, lowercase: normalization inside the hash
      val emit: Int =
        if (isSpace && lastSpace) -1
        else if (isSpace) ' '
        else Character.toLowerCase(c0)
      if (emit >= 0) {
        h = mulmodM61(h, 257) + emit
        if (h >= MersennePrime) h -= MersennePrime
      }
      lastSpace = isSpace
      i += 1
    }
    h
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): minimum
    * shingle hash per sliding window — the standard local document
    * fingerprint for near-dup detection at corpus scale.
    */
  def winnow(text: String, k: Int, window: Int): Array[Int] = {
    winnowSelect(text, k, window, emitPositions = false)
  }

  /** Selected gram START positions (1-based, substr convention) of the same
    * winnowing scheme — the position form [[graft.ops.Dedup.duplicateSpans]]
    * uses as its shuffle divider: selection is content-determined
    * (rightmost-minimum, self-synchronizing), so any substring shared
    * between two places that is at least k+window−1 chars long has at least
    * one identical gram selected in both copies, and consecutive selected
    * positions are never more than `window` apart.
    */
  def winnowPositions(text: String, k: Int, window: Int): Array[Long] =
    winnowSelect(text, k, window, emitPositions = true)
      .map(p => (p + 1).toLong)

  /** [[winnowPositions]] with md5-derived gram hashes — the winnowing
    * certification seam: the identical rightmost-minimum selection loop,
    * but gram hashes are [[md5Hash32]] (unsigned 32-bit values carried
    * in Longs, so comparison order equals the SQL BIGINT order), which
    * lets the per-window argmin replay in a SQL oracle as one
    * window-frame MIN over the composite key `h·2^24 + (2^24−1−pos)`
    * (min h, rightmost-pos tiebreak, decoded back from the low bits).
    * Positions are 1-based, substr convention. Production keeps the
    * MurmurHash3 [[winnowPositions]].
    */
  def winnowPositionsMd5(text: String, k: Int, window: Int): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = md5Hash32(text.substring(i, i + k)); i += 1 }
    if (n <= window) {
      var minPos = 0
      var j = 1
      while (j < n) { if (hs(j) <= hs(minPos)) minPos = j; j += 1 }
      return Array((minPos + 1).toLong)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var w = 0
    var prevMinPos = -1
    while (w <= n - window) {
      var minPos = w
      var j = w + 1
      while (j < w + window) {
        if (hs(j) <= hs(minPos)) minPos = j
        j += 1
      }
      if (minPos != prevMinPos) {
        out += (minPos + 1).toLong
        prevMinPos = minPos
      }
      w += 1
    }
    out.toArray
  }

  private def winnowSelect(text: String, k: Int, window: Int,
                           emitPositions: Boolean): Array[Int] = {
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    val hs = new Array[Int](n)
    var i = 0
    while (i < n) {
      hs(i) = MurmurHash3.stringHash(text.substring(i, i + k), 0x9747b28c)
      i += 1
    }
    if (n <= window) {
      var minPos = 0
      var j = 1
      while (j < n) { if (hs(j) <= hs(minPos)) minPos = j; j += 1 }
      return Array(if (emitPositions) minPos else hs(minPos))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var w = 0
    var prevMinPos = -1
    while (w <= n - window) {
      var minPos = w
      var j = w + 1
      while (j < w + window) {
        if (hs(j) <= hs(minPos)) minPos = j
        j += 1
      }
      if (minPos != prevMinPos) {
        out += (if (emitPositions) minPos else hs(minPos))
        prevMinPos = minPos
      }
      w += 1
    }
    out.toArray
  }

  // --- language id + quality --------------------------------------------

  /** Tiny deterministic stopword profiles for the corpus's language set.
    * N-gram/stopword heuristic — NOT a trained model (none available
    * offline); precision is bounded but the operator shape (dictionary
    * broadcast + per-doc scoring in one pass) is the scale-correct one.
    */
  private val profiles: Array[(String, Array[String])] = Array(
    "en" -> Array("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "es" -> Array("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Array("der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Array("le", "la", "et", "les", "des", "un", "une", "du", "est", "pour"),
    "pt" -> Array("o", "a", "de", "que", "e", "do", "da", "em", "um", "para"),
    "it" -> Array("il", "di", "che", "e", "la", "per", "un", "in", "non", "sono"))
  private val profileSets: Array[(String, java.util.HashSet[String])] =
    profiles.map { case (l, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      (l, s)
    }

  /** Heuristic language id: argmax stopword-hit rate; "und" (undetermined)
    * when nothing scores.
    */
  def langId(text: String): String = {
    if (text == null) return "und"
    val words = text.toLowerCase.split("\\s+")
    var bestLang = "und"
    var bestScore = 0
    var i = 0
    while (i < profileSets.length) {
      val (lang, set) = profileSets(i)
      var score = 0
      var j = 0
      while (j < words.length) {
        if (set.contains(words(j))) score += 1
        j += 1
      }
      if (score > bestScore) { bestScore = score; bestLang = lang }
      i += 1
    }
    bestLang
  }

  /** BPE-ish sub-word token count: word-boundary regex pieces plus a
    * 4-chars-per-piece continuation estimate — a deterministic, offline
    * stand-in for a real tokenizer with the right asymptotics.
    */
  def tokenCountBpeIsh(text: String): Int = {
    if (text == null) return 0
    var count = 0
    val m = BpePiece.matcher(text)
    while (m.find()) {
      val len = m.end() - m.start()
      count += 1 + (len - 1) / 4
    }
    count
  }
  private val BpePiece =
    java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]")

  /** DEFLATE-compressed byte length of the UTF-8 text (zlib level 6, raw
    * stream) — the numerator source of the compression-ratio quality
    * signal several curation recipes ship (machine-generated/repetitive
    * text compresses far below prose; ratio = octet_length/deflate_len).
    * Deterministic for a fixed JDK zlib. The native Deflater (and its
    * output scratch buffer) is thread-local and `reset()` between rows —
    * per-call deflateInit/end would dominate the actual compression work
    * on short documents at corpus scale.
    */
  def deflateLen(text: String): Int = {
    if (text == null) return 0
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = deflaterTl.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = deflateBufTl.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
  private val deflaterTl =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(6, true))
  private val deflateBufTl =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  /** Longest-common-subsequence length of the two texts' WHITESPACE
    * token sequences (lowercased — the module's shared tokenizer) — the
    * ROUGE-L kernel (Lin 2004 §3.1: sentence-level LCS over words).
    * Two-row dynamic program, O(min len) memory, O(n·m) time; each side
    * is capped at `MaxLcsTokens` tokens (ROUGE pairs are summary/
    * reference-sized by nature — the cap bounds the per-row DP at ~4M
    * cells so one adversarial document pair cannot stall an executor
    * core; past-cap tails are ignored, documented in rougeLCounts).
    */
  def lcsTokens(a: String, b: String): Long = {
    if (a == null || b == null) return 0L
    val ta0 = a.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      .filter(_.nonEmpty)
    val tb0 = b.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      .filter(_.nonEmpty)
    val ta = if (ta0.length > MaxLcsTokens) ta0.take(MaxLcsTokens) else ta0
    val tb = if (tb0.length > MaxLcsTokens) tb0.take(MaxLcsTokens) else tb0
    if (ta.isEmpty || tb.isEmpty) return 0L
    // DP over the SHORTER side for O(min) memory
    val (xs, ys) = if (ta.length >= tb.length) (ta, tb) else (tb, ta)
    var prev = new Array[Int](ys.length + 1)
    var cur = new Array[Int](ys.length + 1)
    var i = 0
    while (i < xs.length) {
      val xi = xs(i)
      var j = 0
      while (j < ys.length) {
        cur(j + 1) =
          if (xi == ys(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(ys.length).toLong
  }
  final val MaxLcsTokens = 2048

  // --- vector math -------------------------------------------------------

  /** Cosine similarity of two float vectors (0.0 on zero-norm input). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Deterministic pseudo-gaussian hyperplane component for (plane, dim):
    * sum of three uniform hashes, centered — Irwin–Hall(3) ≈ normal, cheap
    * and reproducible everywhere.
    */
  private def planeComponent(plane: Int, dim: Int): Double = {
    var s = 0.0
    var t = 0
    while (t < 3) {
      val h = MurmurHash3.productHash((plane, dim, t), 0x2545f491)
      s += (h.toDouble / Int.MaxValue)
      t += 1
    }
    s
  }

  /** Gopher within-doc repetition statistics in ONE pass over the text —
    * the per-document form of the explode/regroup dataflow (a document's
    * repetition stats are document-local, so distributing them over a
    * shuffle keyed by line/gram text is pure overhead). Semantics mirror
    * the former aggregation chain exactly:
    *
    *  - lines = split(text, delim) with Spark's limit −1 (trailing empties
    *    kept); duplicated = count ≥ 2 within the doc
    *  - grams = sliding word n-grams over whitespace-split tokens of the
    *    trimmed text; top gram = max count, ties to the UTF-8-byte-wise
    *    smallest (Spark's binary string ordering, which the former
    *    min_by(struct) used)
    *  - all lengths in code points, all ratios floored at 1e-6 in double
    *    arithmetic with the same association as the column expressions
    *
    * @return [n_lines: Long, dup_line_frac_u6: Long,
    *   dup_line_char_frac_u6: Long, top_gram: UTF8String,
    *   top_gram_char_frac_u6: Long]
    */
  def repetitionStatsRow(text: String, n: Int, delim: String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    import org.apache.spark.unsafe.types.UTF8String
    val lines = text.split(delim, -1)
    val lineCounts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < lines.length) {
      lineCounts.merge(lines(i), 1, (a, b) => a + b); i += 1
    }
    var dl = 0L; var chars = 0L; var dchars = 0L
    val it = lineCounts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.toLong
      val len = e.getKey.codePointCount(0, e.getKey.length).toLong
      chars += c * len
      if (c >= 2) { dl += c; dchars += c * len }
    }
    val nl = lines.length.toLong
    val toks = text.trim.split("\\s+", -1)
    var topGram = ""
    var topCount = 0
    if (toks.length >= n) {
      val gramCounts = new java.util.HashMap[String, Int]()
      val sb = new java.lang.StringBuilder()
      var g = 0
      while (g <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(g + j)); j += 1
        }
        gramCounts.merge(sb.toString, 1, (a, b) => a + b)
        g += 1
      }
      val git = gramCounts.entrySet().iterator()
      while (git.hasNext) {
        val e = git.next()
        val c = e.getValue
        if (c > topCount || (c == topCount &&
            UTF8String.fromString(e.getKey)
              .compareTo(UTF8String.fromString(topGram)) < 0)) {
          topGram = e.getKey; topCount = c
        }
      }
    }
    val tlen = text.codePointCount(0, text.length).toLong
    val gchars =
      topCount.toLong * topGram.codePointCount(0, topGram.length).toLong
    def u6(num: Long, den: Long): Long =
      if (den > 0) math.floor(num.toDouble / den * 1e6).toLong else 0L
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nl, u6(dl, nl), u6(dchars, chars),
        UTF8String.fromString(topGram), u6(gchars, tlen)))
  }

  /** Random-hyperplane (SimHash-for-vectors, Charikar'02) signature:
    * bit p = sign(v · g_p) for deterministic pseudo-gaussian g_p.
    */
  def hyperplaneSig(v: Array[Float], planes: Int): Long = {
    var sig = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < v.length) {
        dot += v(d) * planeComponent(p, d)
        d += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
