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

  test("trainBpe guards reject driver-hostile parameters") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Tokenize.trainBpe(docs, 10, maxWords = (1 << 24) + 1)
    }
    intercept[IllegalArgumentException] {
      Tokenize.trainBpe(docs, numMerges = 1 << 16, maxWords = 1 << 21)
    }
  }

  test("viterbiSegment picks the max-log-prob segmentation, longest on ties") {
    val lp = Map("un" -> -2.0, "afford" -> -3.0, "able" -> -2.5,
      "u" -> -5.0, "n" -> -5.0, "a" -> -5.0, "f" -> -5.0, "o" -> -5.0,
      "r" -> -5.0, "d" -> -5.0, "b" -> -5.0, "l" -> -5.0, "e" -> -5.0)
    assert(Tokenize.viterbiSegment("unaffordable", lp, 8, -100.0).toSeq
      == Seq("un", "afford", "able"))
    // unknown chars fall back to single-char pieces, never fail
    assert(Tokenize.viterbiSegment("unzqable", lp, 8, -100.0).toSeq
      == Seq("un", "z", "q", "able"))
    // concatenation always rebuilds the word
    assert(Tokenize.viterbiSegment("affordord", lp, 8, -100.0).mkString
      == "affordord")
  }

  test("trainUnigramOnDict: pieces within budget, chars kept, deterministic") {
    val dict = Seq(("lowlow", 8L), ("lower", 6L), ("newest", 4L),
      ("widest", 3L), ("low", 10L))
    val pieces = Tokenize.trainUnigramOnDict(dict, vocabSize = 12,
      maxPieceLen = 6, rounds = 3)
    val byPiece = pieces.toMap
    assert(pieces.size <= 12 + byPiece.keysIterator.count(_.length == 1))
    // the dominant subword survives pruning
    assert(byPiece.contains("low"), s"expected 'low' in ${pieces.map(_._1)}")
    // log-probs normalize (sum of exp <= 1 + eps over the piece set)
    assert(math.abs(pieces.map(p => math.exp(p._2)).sum - 1.0) < 1e-9)
    // deterministic across runs
    assert(pieces == Tokenize.trainUnigramOnDict(dict, vocabSize = 12,
      maxPieceLen = 6, rounds = 3))
  }

  test("unigram end-to-end: distributed train matches dict train; encode exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low low lower lower newest"),
      (2L, "newest widest low lowest"),
      (3L, "low lower newest newest")
    ).toDF("doc_id", "text")
    val dict = Seq(("low", 5L), ("lower", 3L), ("newest", 4L),
      ("widest", 1L), ("lowest", 1L))
    val fromDict = Tokenize.trainUnigramOnDict(dict, 20)
    val fromCorpus = Tokenize.trainUnigram(docs, 20)
    assert(fromDict == fromCorpus,
      "distributed word counts must reproduce the dict-trained pieces")
    val enc = Tokenize.encodeUnigram(docs, fromCorpus).collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getInt(2)))).toMap
    // every doc rebuilds from its tokens (whitespace restored per word)
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { case (id, (toks, n)) =>
      assert(n == toks.length)
      assert(toks.mkString == texts(id).split(" ").filter(_.nonEmpty).mkString,
        s"doc $id tokens must concatenate back to its words")
    }
    // whole frequent words become single pieces under a generous budget
    assert(enc(1L)._1.count(_ == "low") >= 3)
  }
}
