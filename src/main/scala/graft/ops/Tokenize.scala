package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, the
  * sentencepiece/GPT-2 training-data tokenization stage), built
  * scale-first:
  *
  *  - TRAINING never iterates the corpus: the corpus reduces once to a
  *    word-frequency dictionary (map-side-combinable aggregate), merges
  *    are learned greedily on the driver over that compact dict — the
  *    same architecture real BPE trainers use (corpus-size-independent
  *    merge loop; the dict is bounded by `minCount`/`maxWords`).
  *  - ENCODING is one narrow distributed pass: the learned merge table
  *    (vocab-sized, ≤ numMerges entries) rides the closure, and a
  *    per-partition word→tokens memo exploits Zipf (the same word is
  *    never re-encoded within a partition).
  *
  * Word symbols follow the classic formulation: characters, with the
  * end-of-word marker `</w>` fused onto the last character, so merges
  * never cross word boundaries. (A literal `</w>` inside corpus text can
  * alias the marker in token STRINGS; token boundaries and counts are
  * unaffected.)
  */
object Tokenize {

  /** Whitespace words of `textCol` with corpus frequencies — the compact
    * dict BPE trains on. Split on single spaces (empty fragments from runs
    * of spaces are dropped), matching the corpus oracles' `split(text,' ')`.
    */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbol sequence of a word: chars, last char carries `</w>`. */
  private[graft] def symbols(word: String): Array[String] = {
    val n = word.length
    Array.tabulate(n)(i =>
      if (i == n - 1) word.substring(i) + "</w>" else word.substring(i, i + 1))
  }

  private def mergeIn(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy BPE training over a word-frequency dict (driver-side — the
    * dict, not the corpus, bounds the loop). Each round counts adjacent
    * symbol pairs weighted by word frequency and merges the most frequent;
    * ties break on the lexicographically smallest (left, right) pair so
    * training is deterministic. Stops early when no pair repeats.
    */
  def trainBpeOnDict(dict: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words = dict.iterator.map { case (w, c) => (symbols(w), c) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeIn(syms, best._1, best._2), c) }
      }
      round += 1
    }
    merges.toSeq
  }

  /** End-to-end training: distributed word counts → capped dict collect →
    * driver merge loop. `maxWords` keeps the collect bounded on open-ended
    * vocabularies (keeps the most frequent words; count-desc, word asc —
    * deterministic); `minCount` drops hapax noise the way real trainers do.
    *
    * DRIVER MEMORY: the capped dict lives on the driver for the merge
    * loop — the standard real-trainer architecture (corpus-size-
    * independent, dict-size-bounded). Budget roughly
    * `maxWords × (avg word length + ~64 B object overhead)`: the default
    * 2²⁰ words ≈ 100 MB-class, safe on any sane driver; a 2²⁷-word dict
    * would not be. The guard below fails fast with the budget math
    * instead of letting the collect OOM the driver mid-job.
    */
  def trainBpe(docs: DataFrame, numMerges: Int, textCol: String = "text",
               minCount: Long = 1, maxWords: Int = 1 << 20): Seq[(String, String)] = {
    requireTrainerBudget(numMerges, maxWords)
    trainBpeOnDict(collectDict(docs, textCol, minCount, maxWords), numMerges)
  }

  /** The driver-footprint guards [[trainBpe]] and [[trainByteBpe]] share:
    * ~128 B/word ⇒ 2²⁴ words ≈ 2 GB is past any sane driver budget for a
    * side artifact, and the merge loop is O(numMerges × dict), so the
    * product is bounded too. Raise `minCount` instead of `maxWords` —
    * frequency truncation, not dict growth, is how real BPE trainers
    * scale.
    */
  private def requireTrainerBudget(numMerges: Int, maxWords: Int): Unit = {
    require(maxWords > 0 && maxWords <= (1 << 24),
      s"maxWords=$maxWords would collect a ~${maxWords >> 13} MB-class dict " +
        "to the driver; cap it at 2^24 (raise minCount instead)")
    require(numMerges.toLong * maxWords <= (1L << 36),
      s"numMerges=$numMerges × maxWords=$maxWords exceeds the 2^36 " +
        "pair-scan budget of the driver merge loop; lower one of them")
  }

  /** The bounded dict collection [[trainBpe]]/[[trainByteBpe]] share:
    * top-`maxWords` by frequency (ties lexicographic), at least
    * `minCount` occurrences.
    */
  private def collectDict(docs: DataFrame, textCol: String,
                          minCount: Long, maxWords: Int): Seq[(String, Long)] =
    wordCounts(docs, textCol)
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq

  // --- byte-level BPE (GPT-2) ---------------------------------------

  /** GPT-2's bytes→printable-unicode table (Radford et al. 2019,
    * `bytes_to_unicode`): the 188 printable latin-1 bytes map to
    * themselves; the rest take consecutive code points from 256 up, in
    * byte order — an INJECTIVE map, so byte-level BPE trains and encodes
    * over ordinary strings with no unprintable symbols in the vocab
    * artifact.
    */
  private[graft] val byteToUnicode: Array[Char] = {
    val printable = (('!' to '~') ++ ('¡' to '¬') ++
      ('®' to 'ÿ')).toSet
    val out = new Array[Char](256)
    var shift = 0
    var b = 0
    while (b < 256) {
      if (printable.contains(b.toChar)) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
      b += 1
    }
    out
  }

  private[graft] def toByteLevel(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(byteToUnicode(bytes(i) & 0xff)); i += 1
    }
    sb.toString
  }

  /** BYTE-level BPE training (GPT-2 / GPT-NeoX lineage): identical trainer,
    * but words pass through UTF-8 bytes first, so the base alphabet is the
    * 256 byte symbols — no UNK is ever possible (every string is bytes)
    * and multi-byte scripts merge at the byte granularity production
    * tokenizers actually use. Completes the family next to char-BPE,
    * unigram-LM, and WordPiece. Same driver-footprint guards as
    * [[trainBpe]].
    */
  def trainByteBpe(docs: DataFrame, numMerges: Int, textCol: String = "text",
                   minCount: Long = 1,
                   maxWords: Int = 1 << 20): Seq[(String, String)] = {
    requireTrainerBudget(numMerges, maxWords)
    trainBpeOnDict(
      collectDict(docs, textCol, minCount, maxWords)
        .map { case (w, c) => (toByteLevel(w), c) },
      numMerges)
  }

  /** Distributed byte-level encode — [[encodeBpe]] with the byte mapping
    * applied per word before the merge loop.
    */
  def encodeByteBpe(docs: DataFrame, merges: Seq[(String, String)],
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    encodeWith(docs, merges, idCol, textCol, toByteLevel)

  /** Greedy merge application (the standard BPE encode): repeatedly merge
    * the present pair with the lowest merge rank until none applies.
    */
  private[graft] def encodeWord(word: String,
                              rank: collection.Map[(String, String), Int]): Array[String] = {
    var syms = symbols(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else {
        syms = mergeIn(syms, syms(bestIdx), syms(bestIdx + 1))
        continue = syms.length > 1
      }
    }
    syms
  }

  /** Distributed encode: one narrow pass, merges broadcast via the closure
    * (vocab-sized), per-partition word→tokens memo. Output one row per doc:
    * (id, tokens array, n_tokens).
    */
  def encodeBpe(docs: DataFrame, merges: Seq[(String, String)],
                idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    encodeWith(docs, merges, idCol, textCol, identity)

  /** The shared encode pass behind [[encodeBpe]] and [[encodeByteBpe]]:
    * `mapWord` transforms each word before the merge loop (identity for
    * char BPE, [[toByteLevel]] for byte BPE); the memo keys on the
    * ORIGINAL word so the mapping amortizes too.
    */
  private def encodeWith(docs: DataFrame, merges: Seq[(String, String)],
                         idCol: String, textCol: String,
                         mapWord: String => String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rankArr = merges.toArray
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rank = rankArr.iterator.zipWithIndex
          .map { case (p, i) => p -> i }.toMap
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.split(" ").filter(_.nonEmpty)
          val tokens = words.flatMap(w =>
            memo.getOrElseUpdate(w, encodeWord(mapWord(w), rank)))
          (id, tokens, tokens.length)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }

  /** The learned merge table as a DataFrame (rank, left, right) — the
    * publishable model artifact next to a vocab table.
    */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "left", "right")
  }

  // --- unigram-LM tokenizer (Kudo 2018, arXiv:1804.10959 — the
  // SentencePiece "unigram" model, BPE's sibling and the other tokenizer
  // family real pipelines ship) -----------------------------------------
  //
  // Same scale architecture as BPE: the corpus reduces ONCE to the capped
  // word dict; training runs on the driver over that dict (corpus-size-
  // independent); encoding is one mapPartitions pass with the piece table
  // riding the closure and a per-partition memo. Training here is
  // Viterbi (hard) EM: each round segments every dict word with the
  // current piece log-probs, re-estimates probs from the usage counts,
  // and prunes to the vocab budget — the standard lattice-EM refinement
  // differs only in using expected rather than argmax counts; hard EM is
  // deterministic and reproducible, which the oracle discipline values
  // more than the ~1% segmentation difference.

  /** Viterbi segmentation of one word under piece log-probs: the piece
    * sequence maximizing total log-prob. Unknown SINGLE characters fall
    * back to `unkLp` (so every word segments); ties prefer the longest
    * piece at each boundary (scan order) — deterministic.
    */
  private[graft] def viterbiSegment(word: String,
                                    lp: collection.Map[String, Double],
                                    maxPieceLen: Int,
                                    unkLp: Double): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = word.substring(j, i)
        val p = lp.getOrElse(piece,
          if (i - j == 1) unkLp else Double.NegativeInfinity)
        if (p != Double.NegativeInfinity && best(j) + p > best(i)) {
          best(i) = best(j) + p; back(i) = j
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out += word.substring(back(k), k); k = back(k) }
    out.reverseIterator.toArray
  }

  /** Unigram-LM training over a word-frequency dict (driver-side, like
    * [[trainBpeOnDict]]). Seeds the piece inventory with every substring
    * of the dict up to `maxPieceLen` (weighted by word frequency, capped
    * at 4× the vocab budget), then runs `rounds` of Viterbi EM: segment
    * the dict, re-estimate log-probs from usage, prune to `vocabSize`
    * keeping every used single character (so segmentation never gets
    * stuck). Ties prune lexicographically — training is deterministic.
    *
    * @return (piece, log_prob), log-prob descending then piece ascending
    */
  def trainUnigramOnDict(dict: Seq[(String, Long)], vocabSize: Int,
                         maxPieceLen: Int = 8,
                         rounds: Int = 4): Seq[(String, Double)] = {
    require(vocabSize > 0 && rounds >= 1)
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen=$maxPieceLen outside [1, 16]")
    def normalize(counts: Iterable[(String, Long)]): Map[String, Double] = {
      val total = counts.iterator.map(_._2).sum.toDouble
      counts.iterator.map { case (p, c) => p -> math.log(c / total) }.toMap
    }
    // seed: substring counts (weighted by word frequency)
    val seed = scala.collection.mutable.HashMap.empty[String, Long]
    dict.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        val lmax = math.min(maxPieceLen, w.length - i)
        while (l <= lmax) {
          val p = w.substring(i, i + l)
          seed.update(p, seed.getOrElse(p, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    val chars = seed.keysIterator.filter(_.length == 1).toSeq
    val seedBudget = math.max(vocabSize * 4, chars.size)
    val seedMulti = seed.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedBudget - chars.size))
    var lp = normalize(chars.map(c => c -> seed(c)) ++ seedMulti)
    var round = 0
    while (round < rounds) {
      val unk = lp.valuesIterator.foldLeft(0.0)(math.min) - 20.0
      val use = scala.collection.mutable.HashMap.empty[String, Long]
      dict.foreach { case (w, c) =>
        viterbiSegment(w, lp, maxPieceLen, unk).foreach(p =>
          use.update(p, use.getOrElse(p, 0L) + c))
      }
      val singles = use.iterator.filter(_._1.length == 1).toSeq
      val multi = use.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - singles.size))
      lp = normalize(singles ++ multi)
      round += 1
    }
    lp.toSeq.sortBy { case (p, l) => (-l, p) }
  }

  /** End-to-end unigram training: distributed word counts → capped dict
    * collect → driver Viterbi-EM loop. Same driver-memory guards as
    * [[trainBpe]] (the dict is the footprint; the EM loop is
    * O(rounds × dict × maxPieceLen²) character comparisons).
    */
  def trainUnigram(docs: DataFrame, vocabSize: Int,
                   textCol: String = "text", minCount: Long = 1,
                   maxWords: Int = 1 << 20, maxPieceLen: Int = 8,
                   rounds: Int = 4): Seq[(String, Double)] = {
    require(maxWords > 0 && maxWords <= (1 << 24),
      s"maxWords=$maxWords would collect a ~${maxWords >> 13} MB-class dict " +
        "to the driver; cap it at 2^24 (raise minCount instead)")
    val dict = wordCounts(docs, textCol)
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainUnigramOnDict(dict, vocabSize, maxPieceLen, rounds)
  }

  /** Distributed unigram encode: one narrow pass, the piece table riding
    * the closure, per-partition word→pieces memo — the exact
    * [[encodeBpe]] shape. Output one row per doc: (id, tokens array,
    * n_tokens). Unknown characters at encode time segment as single-char
    * pieces (floor log-prob), so every document encodes.
    *
    * `markWordStart = true` prefixes each word's FIRST piece with "▁"
    * (U+2581 — the SentencePiece word-boundary convention), which is
    * what makes [[decodeUnigram]]'s ids→text round trip possible: plain
    * piece streams lose word boundaries (pieces carry no `</w>`/`##`
    * structure). The decoration is applied AFTER Viterbi, so the
    * segmentation (and token COUNT) is identical to the unmarked form —
    * only the token strings differ; the default stays unmarked to keep
    * the piece table the published artifact verbatim.
    */
  def encodeUnigram(docs: DataFrame, pieces: Seq[(String, Double)],
                    idCol: String = "doc_id",
                    textCol: String = "text",
                    markWordStart: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pieceArr = pieces.toArray
    val maxLen = if (pieceArr.isEmpty) 1 else pieceArr.map(_._1.length).max
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val lp = pieceArr.toMap
        val unk = lp.valuesIterator.foldLeft(0.0)(math.min) - 20.0
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.split(" ").filter(_.nonEmpty)
          val tokens = words.flatMap { w =>
            memo.getOrElseUpdate(w, {
              val segs = viterbiSegment(w, lp, maxLen, unk)
              if (markWordStart && segs.nonEmpty) {
                val m = segs.clone(); m(0) = "▁" + m(0); m
              } else segs
            })
          }
          (id, tokens, tokens.length)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }

  /** The learned piece table as a DataFrame (piece, log_prob) — the
    * publishable model artifact, [[mergesDf]]'s unigram twin.
    */
  def piecesDf(spark: SparkSession, pieces: Seq[(String, Double)]): DataFrame = {
    import spark.implicits._
    pieces.toDF("piece", "log_prob")
  }

  // --- WordPiece (Wu et al. 2016, arXiv:1609.08144 §4.1 — the BERT
  // tokenizer's inference pass): greedy LONGEST-match-first against a
  // provided vocabulary, continuation pieces prefixed "##", and the
  // all-or-nothing word rule (any unmatchable remainder maps the WHOLE
  // word to [UNK] — BERT's documented behavior, not a per-char
  // fallback). Completes the tokenizer family: BPE (merge-rank),
  // unigram-LM (Viterbi), WordPiece (greedy) — the three encodings
  // production pipelines actually ship.

  /** Encode one word; `vocab` must contain continuation forms with the
    * "##" prefix. Exposed for the golden tests.
    */
  private[graft] def wordPieceWord(word: String, vocab: Set[String],
                                   unk: String, maxWordLen: Int): Array[String] = {
    if (word.length > maxWordLen) return Array(unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (end > start && found == null) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab(sub)) found = sub else end -= 1
      }
      if (found == null) return Array(unk) // all-or-nothing (BERT rule)
      out += found
      start = end
    }
    out.toArray
  }

  /** Distributed WordPiece encode: one narrow mapPartitions pass, the
    * vocabulary broadcast via the closure (vocab-sized — BERT ships
    * 30k pieces), per-partition word→pieces memo (the [[encodeBpe]]
    * shape). Whitespace pre-tokenization on the lowercased text, like
    * the repo's other tokenizers.
    *
    * @return one row per doc: (id, tokens array, n_tokens)
    */
  def encodeWordPiece(docs: DataFrame, vocab: Seq[String],
                      unk: String = "[UNK]", maxWordLen: Int = 64,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    require(vocab.nonEmpty && vocab.size <= (1 << 22),
      s"vocab must be non-empty and closure-shippable (got ${vocab.size})")
    require(maxWordLen >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabArr = vocab.toArray
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val vs = vocabArr.toSet
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            // Locale.ROOT: default-locale toLowerCase is machine-
            // dependent (tr_TR dots 'I' to 'ı') and would disagree
            // with the Spark lower() the vocab derivation used
            else text.toLowerCase(java.util.Locale.ROOT)
              .split("\\s+").filter(_.nonEmpty)
          val tokens = words.flatMap(w =>
            memo.getOrElseUpdate(w, wordPieceWord(w, vs, unk, maxWordLen)))
          (id, tokens, tokens.length)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }

  /** Derive a WordPiece vocabulary from the corpus the cheap published
    * way (the original WordPiece trains like BPE; pipelines commonly
    * seed with chars + frequent whole words): every character of the
    * capped word dict in both initial and "##" continuation form, plus
    * the `topWords` most frequent whole words. Driver-bounded like
    * [[trainBpe]] (the word dict collect is capped by `maxWords`).
    */
  def wordPieceVocab(docs: DataFrame, topWords: Int = 1000,
                     minCount: Long = 1, maxWords: Int = 1 << 20,
                     textCol: String = "text"): Seq[String] = {
    require(topWords >= 0 && maxWords > 0)
    val dict = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // iterate CODE POINTS, not UTF-16 chars: a supplementary-plane
    // character (emoji, rare CJK) would otherwise contribute two lone
    // surrogate halves — invalid strings that parquet/UTF8String mangle
    val chars = dict.iterator.flatMap(_._1.codePoints().toArray)
      .toSet.toSeq.sorted.map(cp => new String(Character.toChars(cp)))
    val whole = dict.take(topWords).map(_._1)
    (chars ++ chars.map(c => s"##$c") ++ whole).distinct
  }

  // --- decoders (ids→text): the debugging/pack-validation direction
  // every tokenizer family needs — and the only way to certify the
  // encoders' losslessness END-TO-END (decode ∘ encode == whitespace-
  // normalized identity, pinned by exact-oracle contract queries and
  // property specs). All four are single narrow passes; three are pure
  // codegen expression chains (no kernel at all), byte-BPE alone needs
  // the inverse byte table.

  /** Decode char-BPE tokens back to text: concatenate, turn each fused
    * `</w>` end-of-word marker into a space, drop the trailing one. The
    * exact inverse of [[encodeBpe]]'s tokenization up to whitespace
    * normalization (encode splits on single spaces and drops empties),
    * for ANY merge table — BPE merges only ever concatenate adjacent
    * symbols, so the symbol stream is lossless by construction. Shares
    * the module-header caveat: corpus text containing a literal `</w>`
    * aliases the marker.
    *
    * Pure codegen (array_join + replace + rtrim): no shuffle, no kernel.
    *
    * @return (idCol, outCol)
    */
  def decodeBpe(encoded: DataFrame, idCol: String = "doc_id",
                tokensCol: String = "tokens",
                outCol: String = "text"): DataFrame =
    encoded.select(col(idCol),
      rtrim(replace(array_join(col(tokensCol), ""), lit("</w>"), lit(" ")),
        " ").as(outCol))

  /** [[byteToUnicode]]'s inverse: printable-proxy char → original byte,
    * -1 for chars outside the 323-point image (never produced by
    * [[toByteLevel]]).
    */
  private[graft] val unicodeToByte: Array[Int] = {
    val out = Array.fill(512)(-1)
    var b = 0
    while (b < 256) { out(byteToUnicode(b)) = b; b += 1 }
    out
  }

  /** Decode byte-level BPE tokens back to text: split the concatenated
    * symbol stream at `</w>` markers, map each word's proxy chars back
    * through the GPT-2 byte table, and UTF-8-decode — the round trip
    * that certifies byte-BPE's no-UNK claim end-to-end (EVERY string,
    * emoji and lone-surrogate-free arbitrary UTF-8 included, survives
    * encode→decode bit-exactly up to whitespace normalization; the
    * property spec drives it with arbitrary unicode). One narrow
    * mapPartitions pass (the [[encodeByteBpe]] shape); the 512-entry
    * inverse table rides the closure.
    *
    * @return (idCol, outCol)
    */
  def decodeByteBpe(encoded: DataFrame, idCol: String = "doc_id",
                    tokensCol: String = "tokens",
                    outCol: String = "text"): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    encoded.select(col(idCol).cast("long"), col(tokensCol))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        it.map { case (id, tokens) =>
          val words = (if (tokens == null) "" else tokens.mkString(""))
            .split("</w>", -1)
          val sb = new java.lang.StringBuilder()
          var wi = 0
          while (wi < words.length) {
            val w = words(wi)
            // the stream ends with a marker, so the final split cell is
            // empty — emit spaces BETWEEN words only
            if (wi > 0 && !(wi == words.length - 1 && w.isEmpty))
              sb.append(' ')
            val bytes = new Array[Byte](w.length)
            var ok = true
            var i = 0
            while (i < w.length) {
              val c = w.charAt(i)
              val b = if (c < 512) unicodeToByte(c) else -1
              if (b < 0) ok = false else bytes(i) = b.toByte
              i += 1
            }
            // chars outside the byte image can only come from a token
            // table this decoder didn't produce — surface, don't mangle
            if (!ok) throw new IllegalArgumentException(
              s"decodeByteBpe: token stream of id=$id contains a " +
                "non-byte-level symbol — was this encoded with " +
                "encodeByteBpe?")
            sb.append(new String(bytes,
              java.nio.charset.StandardCharsets.UTF_8))
            wi += 1
          }
          (id, sb.toString)
        }
      }
      .toDF(idCol, outCol)
  }

  /** Decode marked unigram tokens back to text: concatenate and turn
    * each "▁" word-start marker into a space. Requires tokens from
    * [[encodeUnigram]] with `markWordStart = true` — the UNMARKED piece
    * stream has no word boundaries to recover (that is the marker's
    * whole job; SentencePiece made the same call). Alias caveat: corpus
    * text containing a literal ▁ aliases the marker, like `</w>` for
    * BPE. Pure codegen chain.
    *
    * @return (idCol, outCol)
    */
  def decodeUnigram(encoded: DataFrame, idCol: String = "doc_id",
                    tokensCol: String = "tokens",
                    outCol: String = "text"): DataFrame =
    encoded.select(col(idCol),
      ltrim(replace(array_join(col(tokensCol), ""), lit("▁"), lit(" ")),
        " ").as(outCol))

  /** Decode WordPiece tokens back to text: join on spaces, then fuse
    * "##"-continuation pieces onto their predecessors. The inverse of
    * [[encodeWordPiece]] up to its OWN lossy steps — lowercasing and
    * the all-or-nothing `[UNK]` rule (an UNK'd word decodes as the UNK
    * string; with a [[wordPieceVocab]]-derived vocabulary over the same
    * corpus no word UNKs, and the round trip is exact on the lowercased
    * normalized text — the contract query's configuration). Alias
    * caveat: a corpus word containing a literal " ##" boundary aliases
    * the continuation marker. Pure codegen chain.
    *
    * @return (idCol, outCol)
    */
  def decodeWordPiece(encoded: DataFrame, idCol: String = "doc_id",
                      tokensCol: String = "tokens",
                      outCol: String = "text"): DataFrame =
    encoded.select(col(idCol),
      replace(array_join(col(tokensCol), " "), lit(" ##"), lit(""))
        .as(outCol))
}
