package graft

import graft.ops.Tokenize
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Golden BPE tests on the classic Sennrich et al. vocabulary, with the
  * merge sequence and token splits derived by hand (tie-breaks included),
  * plus the distributed wordCounts/encodeBpe path.
  */
class TokenizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("tokenize-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dict = Seq[(String, Long)](
    "low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)

  // Hand-derived: round 1 ties (e,s)=9 with (s,t</w>)=9 -> lexicographic
  // smallest wins; round 4 ties (e,w)/(n,e)/(w,est</w>) at 6 -> (e,w).
  private val expectedMerges = Seq(
    ("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w"), ("ew", "est</w>"))

  test("trainBpeOnDict reproduces the hand-derived merge sequence") {
    assert(Tokenize.trainBpeOnDict(dict, 5) == expectedMerges)
    // prefix property: fewer merges = prefix of the same sequence
    assert(Tokenize.trainBpeOnDict(dict, 3) == expectedMerges.take(3))
  }

  test("training stops early when no pair repeats") {
    val tiny = Seq[(String, Long)]("a" -> 10, "b" -> 3)
    assert(Tokenize.trainBpeOnDict(tiny, 100).isEmpty)
    // one two-symbol word: exactly one merge is learnable
    assert(Tokenize.trainBpeOnDict(Seq("ab" -> 1), 100) ==
      Seq(("a", "b</w>")))
  }

  test("encodeWord applies merges greedily by rank") {
    val rank = expectedMerges.zipWithIndex.toMap
    assert(Tokenize.encodeWord("lowest", rank).toSeq ==
      Seq("lo", "w", "est</w>"))
    assert(Tokenize.encodeWord("newest", rank).toSeq ==
      Seq("n", "ewest</w>"))
    assert(Tokenize.encodeWord("low", rank).toSeq == Seq("lo", "w</w>"))
    // unseen characters stay as singleton symbols
    assert(Tokenize.encodeWord("xyz", rank).toSeq == Seq("x", "y", "z</w>"))
  }

  test("end-to-end: distributed train matches dict train; encode is exact") {
    import spark.implicits._
    // expand the dict into a corpus with the same frequencies
    val docs = dict.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .grouped(4).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    assert(Tokenize.trainBpe(docs, 5) == expectedMerges)

    val enc = Tokenize.encodeBpe(
      Seq((1L, "low lowest newest")).toDF("doc_id", "text"), expectedMerges)
      .collect().head
    assert(enc.getAs[scala.collection.Seq[String]]("tokens").toSeq ==
      Seq("lo", "w</w>", "lo", "w", "est</w>", "n", "ewest</w>"))
    assert(enc.getAs[Int]("n_tokens") == 7)
  }

  test("zero merges degenerate to character counts (the oracle identity)") {
    import spark.implicits._
    val docs = Seq((1L, "ab  cde"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val got = Tokenize.encodeBpe(docs, Nil).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("n_tokens")).toMap
    assert(got == Map(1L -> 5, 2L -> 0, 3L -> 1))
  }

  test("minCount and maxWords bound the dict the driver collects") {
    import spark.implicits._
    val docs = Seq((1L, "aa aa aa bb bb zz")).toDF("doc_id", "text")
    // minCount=2 drops the hapax "zz": no (z,z</w>) merge can be learned
    val merges = Tokenize.trainBpe(docs, 10, minCount = 2)
    assert(!merges.contains(("z", "z</w>")))
    assert(merges.contains(("a", "a</w>")) && merges.contains(("b", "b</w>")))
    // maxWords=1 keeps only the most frequent word
    val top1 = Tokenize.trainBpe(docs, 10, maxWords = 1)
    assert(top1 == Seq(("a", "a</w>")))
  }
}
