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
  * Match semantics are exactly `contains`: case handling stays OUTSIDE
  * (lower both sides with Spark's `lower()` for parity with the theta-join
  * and the SQL oracle); an empty pattern matches every document (contains
  * parity), carried as output on the root state. Matching is over UTF-16
  * chars, which agrees with byte-level `contains` on valid Unicode because
  * UTF-8/UTF-16 are self-synchronizing.
  *
  * The automaton is built ONCE on the driver and ships with the plan as a
  * codegen reference object (blocklists are list-sized by nature; the
  * [[AcFindPhrases]] caller caps pattern count). Output sets are merged
  * down fail links at build time, so matching does O(1) state work per
  * char plus O(1) per reported hit — the worst case of the merge is
  * Σ nesting-depth over patterns (pathological only for chains like
  * "a","aa","aaa",…, still quadratic in PATTERN count, never in text).
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  // transitions in one (state << 16 | char)-keyed map: compact to
  // serialize, O(1) lookup; state count ≤ total pattern chars + 1 < 2^31,
  // and the key packs state into the high 48 bits so ids never collide
  private val gotoMap = new java.util.HashMap[Long, Integer]()
  private val (failLink, outSets): (Array[Int], Array[Array[Int]]) = {
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer[(Char, Int)]())
    val out = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer[Int]())
    var pi = 0
    while (pi < patterns.length) {
      var s = 0
      for (ch <- patterns(pi)) {
        val key = (s.toLong << 16) | ch
        val nxt = gotoMap.get(key)
        if (nxt == null) {
          gotoMap.put(key, children.size)
          children += scala.collection.mutable.ArrayBuffer[(Char, Int)]()
          out += scala.collection.mutable.ArrayBuffer[Int]()
          children(s) += ((ch, children.size - 1))
          s = children.size - 1
        } else s = nxt
      }
      out(s) += pi
      pi += 1
    }
    val fail = Array.fill(children.size)(0)
    val queue = new java.util.ArrayDeque[Int]()
    for ((_, v) <- children(0)) queue.add(v) // depth-1 states fail to root
    while (!queue.isEmpty) {
      val u = queue.poll()
      for ((ch, v) <- children(u)) {
        var f = fail(u)
        while (f != 0 && gotoMap.get((f.toLong << 16) | ch) == null)
          f = fail(f)
        val t = gotoMap.get((f.toLong << 16) | ch)
        fail(v) = if (t == null || t == v) 0 else t.intValue()
        out(v) ++= out(fail(v)) // merged dictionary-suffix outputs
        queue.add(v)
      }
    }
    (fail, out.map(_.sorted.toArray).toArray)
  }
  @transient private lazy val utf8Patterns: Array[UTF8String] =
    patterns.map(UTF8String.fromString)

  /** Distinct matched patterns, ascending pattern order (callers pass the
    * patterns pre-sorted, making this lexicographic — `element_at(…, 1)`
    * is then the alphabetically first hit, the theta-join's `min`).
    */
  def matchedSorted(text: String): ArrayData = {
    val hits = new java.util.BitSet(patterns.length)
    for (p <- outSets(0)) hits.set(p) // empty pattern: contains parity
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && gotoMap.get((s.toLong << 16) | ch) == null)
        s = failLink(s)
      val t = gotoMap.get((s.toLong << 16) | ch)
      s = if (t == null) 0 else t.intValue()
      val o = outSets(s)
      var j = 0
      while (j < o.length) { hits.set(o(j)); j += 1 }
      i += 1
    }
    val res = new Array[AnyRef](hits.cardinality())
    var k = 0
    var b = hits.nextSetBit(0)
    while (b >= 0) {
      res(k) = utf8Patterns(b); k += 1
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
