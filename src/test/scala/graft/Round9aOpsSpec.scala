package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CorpusKernels

/** Round-9 batch 1: the md5 certification seams for SimHash and
  * winnowing (the last convertible rows-only queries), pinned against
  * golden values, brute force, and the production (MurmurHash3) paths'
  * structural guarantees.
  */
class Round9aOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round9a-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // --- md5 seam hashes -----------------------------------------------------

  test("md5Hash64 equals the first-16-hex-digits reconstruction " +
      "(cross-engine lattice golden)") {
    // md5('hello') = 5d41402abc4b2a76b9719d911017c592:
    // (0x5d41402a << 32) | 0xbc4b2a76
    assert(CorpusKernels.md5Hash64("hello") === 6719722671305337462L)
    assert(CorpusKernels.md5Hash32("hello") === 0x5d41402aL)
    // high-bit case: the signed-hi reconstruction must round-trip
    val h = CorpusKernels.md5Hash64("a")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("a".getBytes("UTF-8")).take(8)
      .map(b => f"${b & 0xff}%02x").mkString
    assert(h === java.lang.Long.parseUnsignedLong(hex, 16))
  }

  test("simHashMd5 goldens (python md5 reference) and null/empty edges") {
    assert(CorpusKernels.simHashMd5(
      "the quick brown fox jumps over the lazy dog") ===
      1140603644929599182L)
    assert(CorpusKernels.simHashMd5(
      "completely different text with other words entirely here now") ===
      3311298201760558518L)
    // tokenizer parity: leading/trailing/interior whitespace classes
    assert(CorpusKernels.simHashMd5("  leading   spaces\tand\ttabs\n" +
      "newlines mixed ") === 2115668343085938971L)
    assert(CorpusKernels.simHashMd5(null) === 0L)
    assert(CorpusKernels.simHashMd5("") === 0L)
    assert(CorpusKernels.simHashMd5(" \t\n ") === 0L)
  }

  test("simhashPairs md5 seam equals brute-force hamming <= 3 over " +
      "simHashMd5 signatures (banding completeness in-JVM)") {
    import spark.implicits._
    // near-dup groups: shared long word tail, one word flipped per member
    val docs = (0 until 40).map { i =>
      val grp = i / 4
      val base = (0 until 30).map(w => s"tok${grp}_$w").mkString(" ")
      (i.toLong, s"var$i $base")
    }.toDF("doc_id", "text")
    val got = graft.ops.Dedup.simhashPairs(docs, maxHamming = 3,
      md5Seam = true)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val sigs = docs.as[(Long, String)].collect()
      .map { case (id, t) => (id, CorpusKernels.simHashMd5(t)) }
    val exp = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (a, b, d)).toSet
    assert(exp.nonEmpty, "planted corpus must produce near-dup pairs")
    assert(got === exp)
  }

  test("winnowPositionsMd5: selection invariants + brute-force equality " +
      "(rightmost-minimum per window, distinct)") {
    val k = 8; val w = 4
    def brute(text: String): Seq[Long] = {
      if (text == null || text.length < k) return Seq.empty
      val n = text.length - k + 1
      val hs = (0 until n).map(i =>
        CorpusKernels.md5Hash32(text.substring(i, i + k)))
      if (n <= w) {
        var mp = 0
        for (j <- 1 until n) if (hs(j) <= hs(mp)) mp = j
        return Seq((mp + 1).toLong)
      }
      (0 to n - w).map { w0 =>
        var mp = w0
        for (j <- w0 + 1 until w0 + w) if (hs(j) <= hs(mp)) mp = j
        (mp + 1).toLong
      }.distinct
    }
    val texts = Seq(
      "the winnowing scheme selects a minimum per sliding window",
      "aaaaaaaaaaaaaaaaaaaaaaaa", // all grams equal: tie-break everywhere
      "abcabcabcabcabcabcabc",    // periodic: repeated gram hashes
      "short", "exactly8", "exactly8c", "", null)
    texts.foreach { t =>
      val got = CorpusKernels.winnowPositionsMd5(t, k, w).toSeq
      assert(got === brute(t), s"text=$t")
      // structural guarantee shared with the murmur path: consecutive
      // selected positions are <= window apart
      got.sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= w, s"gap > window in $t")
        case _ =>
      }
    }
  }

  test("md5-seam expressions compile under CODEGEN_ONLY factory mode") {
    // a broken doGenCode would silently fall back to interpreted eval;
    // CODEGEN_ONLY turns that into a hard failure (ExtensionsSpec's
    // discipline, applied to the md5Seam variants the SQL registry
    // doesn't cover)
    val strict = spark.newSession()
    strict.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    strict.conf.set("spark.sql.codegen.fallback", "false")
    import strict.implicits._
    import graft.functions.CorpusFunctions._
    val text = "the quick brown fox jumps over the lazy dog the end"
    val row = Seq(text).toDF("t")
      .select(simhash64(col("t"), md5Seam = true),
        winnow_positions(col("t"), 8, 4, md5Seam = true))
      .head()
    assert(row.getLong(0) === CorpusKernels.simHashMd5(text))
    assert(row.getSeq[Long](1) ===
      CorpusKernels.winnowPositionsMd5(text, 8, 4).toSeq)
  }

  test("md5-seam duplicateSpans(window) is a subset of full " +
      "duplicateSpans and finds spans >= k+window-1") {
    import spark.implicits._
    val shared = "0123456789" * 12 // 120 chars, >= k+window-1 = 67
    val docs = Seq(
      (1L, s"unique prefix one $shared suffix alpha"),
      (2L, s"another beginning $shared closing beta"),
      (3L, "no duplication in this document at all, short and boring"))
      .toDF("doc_id", "text")
    val winnowed = graft.ops.Dedup.duplicateSpans(docs, k = 60,
      window = Some(8), md5Seam = true)
      .select("gram").as[String].collect().toSet
    val full = graft.ops.Dedup.duplicateSpans(docs, k = 60)
      .select("gram").as[String].collect().toSet
    assert(winnowed.nonEmpty,
      "a 120-char shared span must surface through winnowing")
    assert(winnowed.subsetOf(full))
  }
}
