package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Round-7 batch 3: the eval-metric trio's remaining members — chrF
  * char-n-gram counts and ROUGE-L LCS counts (kernel DP pinned against
  * a brute-force reference).
  */
class Round7cOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round7c-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.functions.CorpusKernels
  import graft.ops.TextAnalysis

  // --- lcsTokens kernel -------------------------------------------------

  test("lcsTokens: hand-derived goldens (order without adjacency, " +
      "case-fold, nulls, empties)") {
    assert(CorpusKernels.lcsTokens("the cat sat", "the dog sat") == 2L)
    assert(CorpusKernels.lcsTokens("a b c d e", "e d c b a") == 1L)
    assert(CorpusKernels.lcsTokens("x a b c y", "a q b r c") == 3L)
    assert(CorpusKernels.lcsTokens("The CAT", "the cat") == 2L)
    assert(CorpusKernels.lcsTokens("", "the cat") == 0L)
    assert(CorpusKernels.lcsTokens(null, "x") == 0L)
    assert(CorpusKernels.lcsTokens("a  b\tc", "a b c") == 3L) // \s+ split
  }

  test("lcsTokens: agrees with a brute-force recursive reference on " +
      "200 seeded small cases") {
    def brute(a: List[String], b: List[String]): Int = (a, b) match {
      case (Nil, _) | (_, Nil) => 0
      case (x :: xs, y :: ys) if x == y => 1 + brute(xs, ys)
      case (x :: xs, y :: ys) =>
        math.max(brute(xs, y :: ys), brute(x :: xs, ys))
    }
    val r = new Random(41)
    val alpha = Array("u", "v", "w")
    (0 until 200).foreach { _ =>
      val a = Seq.fill(r.nextInt(9))(alpha(r.nextInt(3)))
      val b = Seq.fill(r.nextInt(9))(alpha(r.nextInt(3)))
      assert(CorpusKernels.lcsTokens(a.mkString(" "), b.mkString(" ")) ==
        brute(a.toList, b.toList).toLong, s"a=$a b=$b")
    }
  }

  test("lcsTokens: per-side token cap bounds the DP (past-cap tail " +
      "ignored, result still the capped prefix's LCS)") {
    val n = CorpusKernels.MaxLcsTokens
    val long = (0 until n + 100).map(i => s"t$i").mkString(" ")
    // identical long strings: LCS of the capped prefixes = cap
    assert(CorpusKernels.lcsTokens(long, long) == n.toLong)
  }

  // --- rougeLCounts -----------------------------------------------------

  test("rougeLCounts: golden pair through the DataFrame surface") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "The cat sat on the mat", "the cat on a mat"),
      (2L, "", "x y"))
      .toDF("pair_id", "text_a", "text_b")
    val out = TextAnalysis.rougeLCounts(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // LCS(the cat sat on the mat | the cat on a mat) = the cat on mat = 4
    assert(out(1L) == ((4L, 6L, 5L)))
    assert(out(2L) == ((0L, 0L, 2L)))
  }

  // --- chrfCounts -------------------------------------------------------

  test("chrfCounts: hand-computed char-gram counts, whitespace " +
      "stripped, both sides' totals") {
    import spark.implicits._
    val pairs = Seq((1L, "abc ab", "Abc")).toDF("pair_id", "text_a", "text_b")
    val out = TextAnalysis.chrfCounts(pairs, maxN = 6).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // cand stripped = "abcab" (5), ref = "abc" (3, lowercased)
    assert(out(1) == ((3L, 5L, 3L)))
    assert(out(2) == ((2L, 4L, 2L)))
    assert(out(3) == ((1L, 3L, 1L)))
    assert(out(4) == ((0L, 2L, 0L)))
    assert(out(5) == ((0L, 1L, 0L)))
    assert(out(6) == ((0L, 0L, 0L)))
  }

  test("chrfCounts: identical sides give n_match == n_cand == n_ref " +
      "for every n (perfect-score numerators)") {
    import spark.implicits._
    val pairs = Seq((1L, "the quick brown fox", "the  quick\tbrown fox"))
      .toDF("pair_id", "text_a", "text_b") // whitespace differences vanish
    val rows = TextAnalysis.chrfCounts(pairs, maxN = 4).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3) && r.getLong(3) == r.getLong(4))
      assert(r.getLong(2) > 0)
    }
  }
}
