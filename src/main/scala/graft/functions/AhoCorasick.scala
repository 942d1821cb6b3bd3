package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring matcher (Aho & Corasick, CACM
  * 1975): ONE pass over the text finds every occurrence of every pattern,
  * independent of pattern count — the scale path for large phrase
  * blocklists, where the broadcast containment theta-join
  * ([[graft.ops.CorpusOps.flagBlocklistedPhrases]]) re-scans each document
  * once PER PHRASE (O(|text|·|patterns|) vs O(|text| + hits) here).
  *
  * Patterns are NORMALIZED at construction (distinct + lexicographically
  * sorted), so [[matchedSorted]]'s ascending-index output is always the
  * distinct matches in alphabetical order regardless of input order or
  * duplicates — `element_at(…, 1)` is the alphabetical min, `size` a
  * distinct count, for the Scala and SQL surfaces alike.
  *
  * Match semantics are exactly `contains`: case handling stays OUTSIDE
  * (lower both sides with Spark's `lower()` for parity with the theta-join
  * and the SQL oracle); an empty pattern matches every document (contains
  * parity), carried as output on the root state. Matching is over UTF-16
  * chars, which agrees with byte-level `contains` on valid Unicode because
  * UTF-8/UTF-16 are self-synchronizing.
  *
  * The automaton is built ONCE on the driver and ships with the plan as a
  * codegen reference object (blocklists are list-sized by nature; the
  * [[AcFindPhrases]] caller caps pattern count). What serializes and what
  * the hot loop touches are primitive parallel arrays — per-state sorted
  * (char, next-state) pairs probed by binary search — never a boxed-key
  * map (a `HashMap[Long, Integer]` per char would allocate a boxed key
  * per character of every document). Output sets are merged down fail
  * links at build time, so matching does O(log fanout) state work per
  * char plus O(1) per reported hit; the merge's worst case is
  * Σ nesting-depth over patterns (pathological only for chains like
  * "a","aa","aaa",…, still quadratic in PATTERN count, never in text).
  */
final class AhoCorasick(patterns0: Array[String]) extends Serializable {
  private val patterns: Array[String] = patterns0.distinct.sorted
  // per-state transitions as sorted parallel primitive arrays + fail
  // links + merged output sets — the complete serialized form
  private val (transChars, transNext, failLink, outSets):
      (Array[Array[Char]], Array[Array[Int]], Array[Int], Array[Array[Int]]) = {
    // build with growable maps, then freeze to arrays
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap[Char, Int]())
    val out = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer[Int]())
    var pi = 0
    while (pi < patterns.length) {
      var s = 0
      for (ch <- patterns(pi)) {
        children(s).get(ch) match {
          case Some(nxt) => s = nxt
          case None =>
            children += scala.collection.mutable.TreeMap[Char, Int]()
            out += scala.collection.mutable.ArrayBuffer[Int]()
            children(s).update(ch, children.size - 1)
            s = children.size - 1
        }
      }
      out(s) += pi
      pi += 1
    }
    val n = children.size
    val fail = Array.fill(n)(0)
    val queue = new java.util.ArrayDeque[Int]()
    for ((_, v) <- children(0)) queue.add(v) // depth-1 states fail to root
    while (!queue.isEmpty) {
      val u = queue.poll()
      for ((ch, v) <- children(u)) {
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        val t = children(f).getOrElse(ch, 0)
        fail(v) = if (t == v) 0 else t
        out(v) ++= out(fail(v)) // merged dictionary-suffix outputs
        queue.add(v)
      }
    }
    (children.map(_.keysIterator.toArray).toArray,
      children.map(_.valuesIterator.toArray).toArray,
      fail, out.map(_.sorted.toArray).toArray)
  }
  @transient private lazy val utf8Patterns: Array[UTF8String] =
    patterns.map(UTF8String.fromString)

  /** next state for (s, ch): the sorted-transition binary search, root
    * self-loop on miss (standard AC goto from state 0).
    */
  private def step(s0: Int, ch: Char): Int = {
    var s = s0
    while (true) {
      val cs = transChars(s)
      val idx = java.util.Arrays.binarySearch(cs, ch)
      if (idx >= 0) return transNext(s)(idx)
      if (s == 0) return 0
      s = failLink(s)
    }
    0 // unreachable
  }

  /** Mask every pattern occurrence with `mask` in ONE pass — the APPLY
    * form of the blocklist (PII strings, bad phrases) the way
    * cutDuplicateSpans is the apply form of duplicateSpans. Overlapping
    * matches resolve LEFTMOST-LONGEST (the lexer rule): earliest start
    * wins; among matches at the same start, the longest; the next match
    * must start after the previous selection ends. Selection happens on
    * the ORIGINAL text only, so a mask can never create or destroy a
    * match (sequential `replace` chains can — their result depends on
    * application order). Empty patterns are ignored here (an empty match
    * would mask nothing, everywhere).
    */
  def maskLeftmostLongest(text: String, mask: String): UTF8String = {
    // collect match intervals packed into ONE long each —
    // (start << 32) | (MaxValue − len) — so the natural long sort IS the
    // (start asc, len desc) sweep order and the hot path stays
    // boxing-free (the class contract: primitive arrays, never boxed
    // keys per row)
    var packed = new Array[Long](16)
    var nMatches = 0
    var s = 0
    var i = 0
    while (i < text.length) {
      s = step(s, text.charAt(i))
      val o = outSets(s)
      var k = 0
      while (k < o.length) {
        val len = patterns(o(k)).length
        if (len > 0) {
          if (nMatches == packed.length)
            packed = java.util.Arrays.copyOf(packed, packed.length * 2)
          packed(nMatches) =
            ((i - len + 1).toLong << 32) | (Int.MaxValue - len).toLong
          nMatches += 1
        }
        k += 1
      }
      i += 1
    }
    if (nMatches == 0) return UTF8String.fromString(text)
    java.util.Arrays.sort(packed, 0, nMatches)
    val sb = new java.lang.StringBuilder(text.length)
    var pos = 0
    var j = 0
    while (j < nMatches) {
      val st = (packed(j) >>> 32).toInt
      val len = Int.MaxValue - (packed(j) & 0x7fffffffL).toInt
      if (st >= pos) {
        sb.append(text, pos, st).append(mask)
        pos = st + len
      }
      j += 1
    }
    sb.append(text, pos, text.length)
    UTF8String.fromString(sb.toString)
  }

  @transient private lazy val patternCpLens: Array[Int] =
    patterns.map(p => p.codePointCount(0, p.length))

  /** Every occurrence of every (non-empty) pattern as (0-based start,
    * pattern) structs, sorted (start asc, pattern index asc) — the
    * EVIDENCE form of the matcher: where [[matchedSorted]] answers
    * "which phrases appear", this answers "where exactly", feeding
    * concordance windows, span-level audits, and mask previews. Same
    * one-pass O(|text| + hits) scan; the packed-long sort keeps the hot
    * path boxing-free (start in the high 32 bits, pattern index low —
    * both nonnegative, so the natural long order IS (start, index)).
    * Empty patterns are skipped (they would "occur" at every offset).
    *
    * Offsets are CODE POINTS, not UTF-16 units — the unit Spark's
    * `length`/`substring` count, so a consumer can slice context
    * windows at the reported offset even past a surrogate pair (the
    * match loop still walks UTF-16 chars; a running code-point counter
    * converts at hit time).
    */
  def hitPositions(text: String): ArrayData = {
    var packed = new Array[Long](16)
    var nMatches = 0
    var s = 0
    var i = 0
    var cp = 0 // code points among chars [0..i] once i is processed
    while (i < text.length) {
      val ch = text.charAt(i)
      if (!(Character.isLowSurrogate(ch) && i > 0 &&
        Character.isHighSurrogate(text.charAt(i - 1)))) cp += 1
      s = step(s, ch)
      val o = outSets(s)
      var k = 0
      while (k < o.length) {
        val pi = o(k)
        if (patterns(pi).length > 0) {
          // match ends at code point cp-1; a pattern is a valid string,
          // so its end never splits a surrogate pair
          val startCp = cp - patternCpLens(pi)
          if (nMatches == packed.length)
            packed = java.util.Arrays.copyOf(packed, packed.length * 2)
          packed(nMatches) = (startCp.toLong << 32) | pi.toLong
          nMatches += 1
        }
        k += 1
      }
      i += 1
    }
    java.util.Arrays.sort(packed, 0, nMatches)
    val res = new Array[Any](nMatches)
    var j = 0
    while (j < nMatches) {
      val st = (packed(j) >>> 32).toInt
      val pi = (packed(j) & 0x7fffffffL).toInt
      res(j) = org.apache.spark.sql.catalyst.InternalRow(st, utf8Patterns(pi))
      j += 1
    }
    new GenericArrayData(res)
  }

  /** Distinct matched patterns, ascending — i.e. lexicographic — order
    * (patterns are normalized at construction).
    */
  def matchedSorted(text: String): ArrayData = {
    val hits = new java.util.BitSet(patterns.length)
    var j = 0
    val rootOut = outSets(0)
    while (j < rootOut.length) { hits.set(rootOut(j)); j += 1 } // "" parity
    var s = 0
    var i = 0
    while (i < text.length) {
      s = step(s, text.charAt(i))
      val o = outSets(s)
      var k = 0
      while (k < o.length) { hits.set(o(k)); k += 1 }
      i += 1
    }
    val res = new Array[AnyRef](hits.cardinality())
    var m = 0
    var b = hits.nextSetBit(0)
    while (b >= 0) {
      res(m) = utf8Patterns(b); m += 1
      b = hits.nextSetBit(b + 1)
    }
    new GenericArrayData(res)
  }
}

/** Codegen'd scalar surface of [[AhoCorasick]]: text → sorted distinct
  * matched patterns. The automaton builds once at planning and rides the
  * plan as a reference object — per row there is exactly one static-shape
  * call inside whole-stage codegen, like every other kernel here.
  */
case class AcFindPhrases(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val ac = new AhoCorasick(patterns.toArray)
  override def nullSafeEval(input: Any): Any =
    ac.matchedSorted(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", ac,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $acRef.matchedSorted($c.toString());")
  }
  override protected def withNewChildInternal(c: Expression): AcFindPhrases =
    copy(child = c)
  override def prettyName: String = "ac_find_phrases"
}

/** Codegen'd scalar surface of [[AhoCorasick.hitPositions]]: text →
  * array<struct<start, phrase>> of every occurrence with its 0-based
  * character offset, one pass.
  */
case class AcHitPositions(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("phrase", StringType, nullable = false))),
    containsNull = false)
  @transient private lazy val ac = new AhoCorasick(patterns.toArray)
  override def nullSafeEval(input: Any): Any =
    ac.hitPositions(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasickH", ac,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $acRef.hitPositions($c.toString());")
  }
  override protected def withNewChildInternal(c: Expression): AcHitPositions =
    copy(child = c)
  override def prettyName: String = "ac_hit_positions"
}

/** Codegen'd scalar surface of [[AhoCorasick.maskLeftmostLongest]]:
  * text → text with every pattern occurrence masked, one pass,
  * leftmost-longest overlap resolution on the ORIGINAL text.
  */
case class AcMaskPhrases(child: Expression, patterns: Seq[String],
                         mask: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  @transient private lazy val ac = new AhoCorasick(patterns.toArray)
  override def nullSafeEval(input: Any): Any =
    ac.maskLeftmostLongest(input.asInstanceOf[UTF8String].toString, mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasickM", ac,
      classOf[AhoCorasick].getName)
    val maskRef = ctx.addReferenceObj("acMask", mask, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $acRef.maskLeftmostLongest($c.toString(), $maskRef);")
  }
  override protected def withNewChildInternal(c: Expression): AcMaskPhrases =
    copy(child = c)
  override def prettyName: String = "ac_mask_phrases"
}
